"""As-of (temporal nearest-key) join — a scale extension beyond the
reference inventory (the reference has no temporal join at all; SURVEY §2.4
"no as-of joins"), but a core primitive for event-feature pipelines:
"for each event, the most recent prior observation of X for the same key".

Spark-first design — the union + running-``last`` formulation:

    left (tagged side=1)  ∪  right (tagged side=0, value cols carried)
      → ONE hash shuffle on the join key
      → per-key sort by (ts, side)
      → ``last(value, ignorenulls) over (rows unbounded preceding..current)``
      → keep left rows

This costs exactly one Exchange + one Window sort — the same shuffle shape
as a ``groupBy(key)`` — and stays entirely inside whole-stage codegen (no
Python, no ``applyInPandas``).  A sort-merge join cannot express "nearest
ts ≤ mine" without an exploding range predicate, and a naive
``l.ts >= r.ts`` range join is O(n·m) per key; the running-last window is
O((n+m) log(n+m)) per key and never materializes candidate pairs.

Skew note (100 TB): the window sorts each key's full history within one
task.  Keys are users/devices/instruments — bounded history per key — so
per-key sort fits executor memory; a pathological single hot key degrades
to one large sorted spill, not a cross product.

Semantics match ``pandas.merge_asof`` / DuckDB ``ASOF JOIN``:
- direction='backward' (default): match greatest right ts <= left ts
  (strict=True: < ).
- direction='forward': match smallest right ts >= left ts (strict: >).
- tolerance (seconds): matches farther than the tolerance are nulled out.
- Right rows with a NULL timestamp never match; left rows with a NULL
  timestamp match nothing (pandas raises instead — documented divergence).
- Duplicate right rows on (key, ts) are a caller contract (pandas keeps
  the last occurrence — an input-order notion Spark does not have);
  pre-aggregate the right side to make the result deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

_SIDE = "__asof_side"
_TS = "__asof_ts"
_MATCH_TS = "__asof_match_ts"


@register("asof_join", PluginType.TRANSFORMER)
def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str, right_ts: str | None = None,
              value_cols: list[str] | None = None,
              direction: str = "backward", strict: bool = False,
              tolerance: float | None = None,
              matched_ts_col: str | None = None) -> DataFrame:
    """For each left row, attach ``value_cols`` from the temporally nearest
    right row with the same key.  Returns all left columns plus the value
    columns (null when no match / outside tolerance) and, when
    ``matched_ts_col`` is given, the matched right timestamp."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    collisions = [c for c in value_cols if c in left.columns]
    if collisions:
        raise ValueError(f"value_cols already exist on left: {collisions}")

    l_tag = (left.withColumn(_SIDE, F.lit(1))
                 .withColumn(_TS, F.col(left_ts)))
    r_tag = (right.where(F.col(right_ts).isNotNull())
                  .select(*keys,
                          F.col(right_ts).alias(_TS),
                          F.lit(0).alias(_SIDE),
                          *[F.col(c) for c in value_cols]))
    # unionByName fills each side's missing columns with nulls
    both = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # At equal ts an INCLUSIVE match must see the right row (right sorts
    # first); a STRICT match must not (left sorts first).  For forward
    # direction the ts order flips but the side tie-break logic is the same.
    side_order = F.col(_SIDE) if not strict else -F.col(_SIDE)
    ts_order = F.col(_TS).desc() if direction == "forward" else F.col(_TS)
    w = (Window.partitionBy(*keys).orderBy(ts_order, side_order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    # ONE struct payload, not per-column last(ignorenulls): a NULL value
    # field must ride with ITS OWN row's timestamp — per-column carries
    # would skip the NULL and stitch an older row's value onto the
    # matched ts (found by the NULL-injection probe).  The struct is
    # non-null whenever a right row exists, so ignorenulls only skips
    # left rows.
    payload = F.struct(F.col(_TS).alias("__mts"),
                       *[F.col(c) for c in value_cols])
    carried = both.withColumn(
        "__match",
        F.last(F.when(F.col(_SIDE) == 0, payload), ignorenulls=True)
        .over(w))
    for c in value_cols:
        carried = carried.withColumn(c, F.col("__match")[c])
    carried = (carried.withColumn(_MATCH_TS, F.col("__match")["__mts"])
               .drop("__match"))

    out = carried.where(F.col(_SIDE) == 1)
    # NULL left ts: window puts nulls first (or last desc) — the carried
    # value there is meaningless; null the match out explicitly.  A NULL
    # join KEY also never matches (SQL equi-join semantics — the window
    # partition would otherwise pool all NULL keys into one group).
    no_match = F.col(left_ts).isNull() | F.col(_MATCH_TS).isNull()
    for k in keys:
        no_match = no_match | F.col(k).isNull()
    if tolerance is not None:
        gap = F.abs(F.col(left_ts).cast("double")
                    - F.col(_MATCH_TS).cast("double"))
        no_match = no_match | (gap > F.lit(float(tolerance)))
    for c in value_cols:
        out = out.withColumn(c, F.when(no_match, F.lit(None))
                                .otherwise(F.col(c)))
    out = out.withColumn(_MATCH_TS, F.when(no_match, F.lit(None))
                                    .otherwise(F.col(_MATCH_TS)))
    if matched_ts_col is not None:
        out = out.withColumn(matched_ts_col, F.col(_MATCH_TS))
    return out.drop(_SIDE, _TS, _MATCH_TS)
