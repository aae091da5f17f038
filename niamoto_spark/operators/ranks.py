"""Distributed exact global ranking — the shared two-phase prefix-sum
recipe (range-partition on the sort key, one COUNT per partition to
the driver, broadcast prefix offsets, partition-local row_number) that
epoch_order / quantile_bucket / nucleus_vocab each inline.  Driver
state is one long per partition; no single-partition WindowExec ever
sees the data."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: list, out_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = exact 1-based global position under
    ``order_cols`` (list of Columns or names; ties broken by whatever
    the caller includes — include a unique key for determinism)."""
    order = [F.col(c).asc() if isinstance(c, str) else c
             for c in order_cols]
    n_parts = (num_partitions
               or df.sparkSession.sparkContext.defaultParallelism)
    parted = (df.repartitionByRange(n_parts, *order)
              .withColumn("__pid", F.spark_partition_id())
              .persist())
    try:
        subtotals = (parted.groupBy("__pid")
                     .agg(F.count(F.lit(1)).alias("c")).collect())
        run, offsets = 0, {}
        for r in sorted(subtotals, key=lambda r: r["__pid"]):
            offsets[r["__pid"]] = run
            run += r["c"]
        if offsets:
            off_map = F.create_map(
                *[F.lit(v) for kv in offsets.items() for v in kv])
            start = off_map[F.col("__pid")]
        else:
            start = F.lit(0)
        w = Window.partitionBy("__pid").orderBy(*order)
        return (parted.withColumn(
            out_col, (F.row_number().over(w) + start).cast("bigint"))
            .drop("__pid"))
    except Exception:
        parted.unpersist()
        raise
