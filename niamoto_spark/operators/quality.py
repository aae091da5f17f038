"""Data-quality expectations: dbt/Great-Expectations-style constraint
checking as Spark aggregations.

A pipeline feeding a 100 TB table needs its contracts (not-null keys,
unique ids, enum domains, value ranges, foreign keys) checked on every
load — and checked CHEAPLY: all row-local rules here compile into ONE
wide aggregate over a single scan (each rule is a ``sum(when(...))``
column), uniqueness adds one count-distinct, and referential rules are
broadcast anti-join counts against the (small) dimension.  Nothing is
collected but the per-rule violation counts.

The reference validates per-row with pydantic models inside its plugin
loaders (src/niamoto/core/plugins/base.py) — per-row Python at 100 TB;
this is the set-oriented re-expression.

Rule forms (dicts):
  {"rule": "not_null", "col": c}
  {"rule": "unique", "cols": [c, ...]}
  {"rule": "accepted_values", "col": c, "values": [...]}
  {"rule": "in_range", "col": c, "lo": x, "hi": y}   # inclusive
  {"rule": "matches", "col": c, "pattern": regex}
  {"rule": "foreign_key", "col": c, "ref": dim_df, "ref_col": k}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

_ROW_LOCAL = {"not_null", "accepted_values", "in_range", "matches"}


def _rule_name(r: dict) -> str:
    kind = r["rule"]
    if kind == "unique":
        return f"unique({','.join(r['cols'])})"
    return f"{kind}({r['col']})"


def _violation_expr(r: dict):
    kind = r["rule"]
    c = F.col(r["col"])
    if kind == "not_null":
        bad = c.isNull()
    elif kind == "accepted_values":
        bad = c.isNotNull() & ~c.isin(list(r["values"]))
    elif kind == "in_range":
        bad = c.isNotNull() & ((c < F.lit(r["lo"])) | (c > F.lit(r["hi"])))
    elif kind == "matches":
        bad = c.isNotNull() & ~c.rlike(r["pattern"])
    else:
        raise ValueError(f"not a row-local rule: {kind}")
    return F.sum(F.when(bad, 1).otherwise(0))


@register("expect", PluginType.TRANSFORMER)
def expect(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Violation counts per rule: (rule string, n_violations long).

    Plan shape: one aggregate for ALL row-local rules (single scan),
    one distinct-count aggregate per ``unique`` rule (duplicate rows
    beyond the first count as violations), one broadcast anti-join
    count per ``foreign_key`` rule (rows whose key has no referenced
    row; NULL keys are not orphans — use not_null to forbid them)."""
    if not rules:
        raise ValueError("expect: no rules given")
    results: list[tuple[str, int]] = []

    row_local = [r for r in rules if r["rule"] in _ROW_LOCAL]
    if row_local:
        agg = df.agg(*[
            _violation_expr(r).alias(f"__r{i}")
            for i, r in enumerate(row_local)]).first()
        for i, r in enumerate(row_local):
            results.append((_rule_name(r), int(agg[f"__r{i}"] or 0)))

    for r in rules:
        if r["rule"] == "unique":
            cols = list(r["cols"])
            any_null = F.lit(False)
            for c in cols:
                any_null = any_null | F.col(c).isNull()
            counts = df.agg(
                F.count(F.lit(1)).alias("__n"),
                F.countDistinct(*[F.col(c) for c in cols]).alias("__d"),
                F.sum(F.when(any_null, 1).otherwise(0)).alias("__nn")
            ).first()
            # countDistinct drops rows where ANY key column is null;
            # exclude exactly those rows from the duplicate arithmetic
            # (use not_null to forbid nulls in the first place).
            dupes = (int(counts["__n"]) - int(counts["__nn"] or 0)
                     - int(counts["__d"]))
            results.append((_rule_name(r), max(0, dupes)))
        elif r["rule"] == "foreign_key":
            ref = r["ref"].select(
                F.col(r["ref_col"]).alias(r["col"])).distinct()
            orphans = (df.where(F.col(r["col"]).isNotNull())
                       .join(F.broadcast(ref), r["col"], "left_anti")
                       .count())
            results.append((f"foreign_key({r['col']})", int(orphans)))
        elif r["rule"] not in _ROW_LOCAL:
            raise ValueError(f"unknown rule {r['rule']!r}")

    spark = df.sparkSession
    return spark.createDataFrame(results, "rule string, n_violations long")


def expect_pass(df: DataFrame, rules: list[dict]) -> bool:
    """True when every rule has zero violations."""
    res = expect(df, rules)
    return res.agg(F.max("n_violations")).first()[0] == 0
