"""SURVEY §2 operator inventory, re-expressed as set-oriented Spark ops.

Every operator here computes its result for ALL groups in one DataFrame job
(`groupBy(group_cols).agg(...)` / joins), replacing the reference's
per-entity query loop (reference transformer.py:488-541).  Operators take and
return DataFrames; none of them collect to the driver except where the data
is structurally small (hierarchy node sets).
"""
