"""Interval (point-in-range) join — a scale extension beyond the reference
inventory (SURVEY §2.4: the reference has no temporal/range join), but a
core event-pipeline primitive: "attach every point event to each time
window that contains it, per key".

Spark-first design — granule co-partitioning instead of a theta join:

    intervals → explode into the coarse time GRANULES they cover
    points    → exactly ONE granule each (floor(ts / granule))
      → equi-join on (key, granule)  [hash shuffle, broadcastable]
      → refine with start <= ts < end

A naive ``l.key = r.key AND r.start <= l.ts AND l.ts < r.end`` join gives
Spark no equi-key beyond ``key``: with few keys it degenerates to a
per-key cross product (BroadcastNestedLoopJoin at worst).  Granule
bucketing restores a composite equi-key whose cardinality scales with
time, so the shuffle spreads over (key × granule) — the standard
overlap-join trick (cf. Spark's own range-join hints in Databricks'
engine, and PostgreSQL GiST time indexing).

Each point lives in exactly ONE granule, so a (point, interval) pair can
match on at most one exploded row — the join never duplicates output and
needs no dedup pass.

Granule sizing: ``granule_s`` should be >= the typical interval length —
each interval then explodes into <= 2 rows while granule cardinality stays
high.  ``max_granules`` guards against an interval (bad data: open-ended
range) exploding into millions of rows; offenders are truncated and
counted in the log.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

log = logging.getLogger(__name__)


@register("interval_join", PluginType.TRANSFORMER)
def interval_join(points: DataFrame, intervals: DataFrame, on: str,
                  point_ts: str, start_col: str, end_col: str,
                  granule_s: int = 3600,
                  max_granules: int = 10_000,
                  how: str = "inner") -> DataFrame:
    """Join each point row to every interval row (same ``on`` key) whose
    [start_col, end_col) half-open range contains ``point_ts``.

    Timestamps are epoch-seconds longs (callers with native timestamps
    cast first — see queries._events for the normalization helper).
    Output: all interval columns + all point columns (caller renames
    collisions beforehand).  ``how='left_outer'`` keeps intervals with no
    points (point columns null).
    """
    g = F.lit(int(granule_s))
    p_gran = F.floor(F.col(point_ts) / g)
    i_first = F.floor(F.col(start_col) / g)
    # half-open [start, end): the granule of (end - 1) is the last covered
    i_last = F.floor((F.col(end_col) - 1) / g)
    n_gran = (i_last - i_first + 1)

    capped = intervals.withColumn(
        "__i_last",
        F.when(n_gran <= max_granules, i_last)
         .otherwise(i_first + max_granules - 1))
    n_truncated = capped.where(
        F.col("__i_last") < i_last).limit(1).count()
    if n_truncated:
        log.warning(
            "interval_join: interval(s) covering > %d granules were "
            "truncated; raise granule_s or max_granules", max_granules)

    exploded = capped.withColumn(
        "__granule", F.explode(F.sequence(i_first, F.col("__i_last")))
    ).drop("__i_last")
    tagged_points = points.withColumn("__granule", p_gran)

    joined = exploded.join(tagged_points, [on, "__granule"], "inner")
    matches = joined.where((F.col(start_col) <= F.col(point_ts)) &
                           (F.col(point_ts) < F.col(end_col))) \
                    .drop("__granule")
    if how == "inner":
        return matches
    if how == "left_outer":
        # intervals that lost every candidate in the refine keep one row
        # with null point columns (caller contract: interval rows are
        # distinct — pre-aggregate or add an id column otherwise)
        matched_keys = matches.select(*intervals.columns).distinct()
        unmatched = intervals.join(matched_keys, intervals.columns,
                                   "left_anti")
        point_types = dict(points.dtypes)
        for c in points.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(point_types[c]))
        return matches.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")


@register("interval_overlap_join", PluginType.TRANSFORMER)
def interval_overlap_join(left: DataFrame, right: DataFrame, on: str,
                          left_start: str = "l_start",
                          left_end: str = "l_end",
                          right_start: str = "r_start",
                          right_end: str = "r_end") -> DataFrame:
    """Interval × interval overlap join per key: pairs where
    [ls, le) ∩ [rs, re) ≠ ∅ (``ls < re AND rs < le``), with the exact
    overlap length — temporal-table intersection (shift×incident,
    subscription×outage, session×campaign).

    Plan shape: an EQUI join on the key with the two range predicates
    as residual filters — both sides hash-partition on the key, no
    theta-join cross product.  The fan-out bound is intervals-per-key
    on each side (temporal tables are key-sparse by nature; for
    key-free or hot-key workloads, granule-bucket first like
    ``interval_join``).  Emits left columns + right columns +
    ``overlap`` (same unit as the bounds)."""
    r = right.withColumnRenamed(on, "__rk")
    cond = ((left[on] == r["__rk"])
            & (left[left_start] < r[right_end])
            & (r[right_start] < left[left_end]))
    joined = left.join(r, cond).drop("__rk")
    ov = (F.least(F.col(left_end), F.col(right_end))
          - F.greatest(F.col(left_start), F.col(right_start)))
    return joined.withColumn("overlap", ov)
