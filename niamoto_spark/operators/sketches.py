"""Mergeable one-pass sketches: Misra–Gries heavy hitters.

``approx_count_distinct`` / ``approx_percentile`` cover HLL and KLL via
Spark built-ins (bench pins their error); frequent-items has no built-in
aggregate, so this implements the Misra–Gries summary — THE mergeable
heavy-hitters sketch (Agarwal et al., "Mergeable Summaries", PODS 2012):

- each partition keeps k counters in one pass (O(k) memory, no shuffle);
- partial summaries MERGE by counter addition + decrement of the
  (k+1)-th largest — the driver combines P partition sketches of k
  counters each, so corpus scale never reaches the driver;
- guarantee: every item with true frequency > n/(k+1) IS in the sketch,
  and each reported count understates the truth by at most n/(k+1).

The exact path (groupBy + top-k) is the oracle-checkable one; the
sketch is for the 100 TB single-pass regime, verified by its
mathematical guarantee in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


def _mg_update(counters: dict, item, inc: int, k: int) -> None:
    if item in counters:
        counters[item] += inc
    elif len(counters) < k:
        counters[item] = inc
    else:
        dec = min(inc, min(counters.values()))
        for key in list(counters):
            counters[key] -= dec
            if counters[key] <= 0:
                del counters[key]
        if inc > dec:
            counters[item] = inc - dec


def _mg_merge(a: dict, b: dict, k: int) -> dict:
    out = dict(a)
    for item, c in b.items():
        _mg_update(out, item, c, k)
    return out


@register("heavy_hitters", PluginType.TRANSFORMER)
def heavy_hitters(df: DataFrame, col: str, k: int = 16) -> list[tuple]:
    """Misra–Gries candidates [(item, lower-bound count), ...] sorted by
    count desc.  One pass, one partial sketch per partition, driver
    merges P·k counters.  Any item with frequency > n/(k+1) is
    guaranteed present."""
    def sketch_partition(rows):
        counters: dict = {}
        for r in rows:
            v = r[0]
            if v is not None:
                _mg_update(counters, v, 1, k)
        if counters:
            yield counters

    partials = df.select(col).rdd.mapPartitions(sketch_partition).collect()
    merged: dict = {}
    for p in partials:
        merged = _mg_merge(merged, p, k)
    return sorted(merged.items(), key=lambda t: (-t[1], str(t[0])))


def heavy_hitters_exact(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Exact top-k frequent items (the oracle-checkable path)."""
    return (df.groupBy(F.col(col).alias("item"))
            .agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("item").asc())
            .limit(k))
