"""Ordered funnel analysis over sessionized event streams.

"Of the sessions that saw stage 1, how many went on to stage 2, then
stage 3 — in that order?"  The product-analytics staple built from the
same sessionization as q31/streaming.sessions.

Spark-first shape: session ids come from one window pass (gap rule →
running sum of new-session flags — a single Exchange on user); each
funnel stage is then a filtered aggregate joined against the previous
stage's first-reach time.  Stage k's join keys on (user, session) — the
SAME partitioning every time, so AQE coalesces the chain without
re-shuffling wide data; only (user, session, ts) triples flow between
stages, never raw events.

Strict ordering: stage k counts only events strictly LATER than the
session's first stage-(k-1) reach — re-ordered funnels (purchase before
view) do not convert.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("funnel", PluginType.TRANSFORMER)
def funnel(events: DataFrame, user_col: str, ts_col: str, type_col: str,
           stages: Sequence[str], gap_s: int = 1800,
           order_cols: Sequence[str] = ()) -> DataFrame:
    """(stage_idx, stage, n_sessions): sessions reaching each stage in
    strict order.  ``ts_col`` is epoch-seconds; ``order_cols`` breaks
    timestamp ties (pass a unique event id)."""
    order = [ts_col, *order_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_s = F.when(prev.isNull() |
                   ((F.col(ts_col) - prev) > gap_s), 1).otherwise(0)
    sess = events.withColumn(
        "__sid",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    spark = events.sparkSession
    counts = []
    reach: DataFrame | None = None
    for i, stage in enumerate(stages):
        stage_events = sess.where(F.col(type_col) == stage)
        if reach is None:
            reach = (stage_events.groupBy(user_col, "__sid")
                     .agg(F.min(ts_col).alias("__t")))
        else:
            reach = (stage_events
                     .join(reach.withColumnRenamed("__t", "__t_prev"),
                           [user_col, "__sid"])
                     .where(F.col(ts_col) > F.col("__t_prev"))
                     .groupBy(user_col, "__sid")
                     .agg(F.min(ts_col).alias("__t")))
        counts.append((i, stage, reach.count()))
    return spark.createDataFrame(
        counts, "stage_idx int, stage string, n_sessions bigint")
