"""Storage layout + skew utilities — the knobs that matter at 100 TB.

- ``write_partitioned``: directory-partitioned parquet with a target file
  size (repartition by partition columns + AQE coalescing keeps file counts
  sane; unpartitioned writes get size-based repartitioning).
- ``write_bucketed``: hash-bucketed managed table so repeated equi-joins /
  aggregations on the bucket key skip their shuffle entirely.
- ``salted_join``: skew mitigation for a hot-key equi-join — the skewed side
  gets a random salt in [0, n), the small side is exploded n ways, and the
  join runs on (key, salt).  AQE's skew-join handles moderate skew
  automatically; salting is for the pathological single-key case (a
  zipfian taxon that is 30% of all occurrences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      target_file_mb: int = 128,
                      approx_row_bytes: int = 256) -> None:
    """Partitioned parquet write with bounded small-file explosion: rows are
    pre-shuffled onto their partition columns so each directory is written
    by few tasks instead of every task writing into every directory."""
    if partition_cols:
        df = df.repartition(*[F.col(c) for c in partition_cols])
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None) -> None:
    """Bucketed + sorted managed table: joins/aggregations keyed on
    ``bucket_col`` between co-bucketed tables run shuffle-free."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-buster equi-join: salt the big side, replicate the small side.

    Delegates to operators/skew.py's deterministic implementation — a
    rand()-derived salt changes on task RETRY (a re-executed partition
    draws different salts than the shuffle files other stages already
    consumed), which the xxhash64-of-row salt cannot."""
    from niamoto_spark.operators.skew import salted_join as _sj

    return _sj(big, small, key, buckets=n_salts, how=how)
