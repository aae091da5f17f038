"""Whole-pipeline differential vs the reference engine (VERDICT r11 #2).

Runs the reference's own TransformerService (its real plugin code,
docs/examples/config/transform.yml verbatim) against a SQLite database
built from synthesized CSVs, runs THIS engine's Pipeline over the same
CSVs and config, and diffs the per-entity widget JSONs.

The reference is executed with three thin module shims (rich,
sqlalchemy, and a sqlite3-backed Database) because this container
carries neither sqlalchemy nor rich — see shims.py.  Every line of
transform logic that runs is the reference's own.
"""
