"""Python Data Source (Spark 4 API) for manifest tables: batch parity,
time travel, streaming incremental delivery with checkpoint restart."""

import pytest
from pyspark.sql import functions as F

from niamoto_spark.sources import manifest as M
from niamoto_spark.sources import pyds


def _df(spark, lo, hi, tag):
    return spark.createDataFrame(
        [(i, tag) for i in range(lo, hi)], "id long, tag string")


@pytest.fixture()
def registered(spark):
    pyds.register(spark)
    return spark


def test_batch_read_matches_read_table(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 7, "a"), path)
    M.append(_df(spark, 7, 10, "b"), path)

    via_ds = (spark.read.format("manifest_table")
              .option("path", path).load())
    via_api = M.read_table(spark, path)
    assert sorted((r.id, r.tag) for r in via_ds.collect()) == \
           sorted((r.id, r.tag) for r in via_api.collect())
    assert via_ds.schema == via_api.schema


def test_batch_time_travel(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 5, "a"), path)
    M.overwrite(_df(spark, 0, 2, "b"), path)

    v0 = (spark.read.format("manifest_table")
          .option("path", path).option("version", 0).load())
    head = (spark.read.format("manifest_table")
            .option("path", path).load())
    assert v0.count() == 5
    assert head.count() == 2


def test_batch_sees_only_committed_txn_state(registered, tmp_path):
    import time

    from niamoto_spark.sources.transactions import (MultiTableTransaction,
                                                    _marker)

    spark = registered
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 4, "base"), path)
    txn = MultiTableTransaction(str(tmp_path / "_txn"))
    with open(_marker(txn.txn_dir, txn.txn_id, "begin"), "w") as f:
        f.write(str(time.time()))
    txn._prepare_one(path, _df(spark, 4, 9, "pending"), "append")

    ds = (spark.read.format("manifest_table")
          .option("path", path).load())
    assert ds.count() == 4                     # pending claim invisible
    txn._write_marker("committed")
    ds2 = (spark.read.format("manifest_table")
           .option("path", path).load())
    assert ds2.count() == 9


def test_stream_incremental_delivery_across_restarts(
        registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "_ckpt")
    out = str(tmp_path / "_out")
    M.append(_df(spark, 0, 6, "a"), path)

    def run_once():
        q = (spark.readStream.format("manifest_table")
             .option("path", path).option("startingVersion", 0).load()
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    got1 = spark.read.parquet(out)
    assert got1.count() == 6

    M.append(_df(spark, 6, 10, "b"), path)
    run_once()
    got2 = spark.read.parquet(out)
    # exactly the 4 new rows delivered on restart — no replay of v0
    assert got2.count() == 10
    assert got2.select("id").distinct().count() == 10


def test_pushdown_zone_map_skipping(registered, tmp_path):
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from niamoto_spark.sources.pyds import ManifestBatchReader

    spark = registered
    path = str(tmp_path / "t")
    # four disjoint id-range files with zone maps
    for lo in (0, 100, 200, 300):
        M.append_with_stats(
            _df(spark, lo, lo + 100, "x").repartition(1), path,
            stats_cols=["id"])

    # end-to-end: values exact through the DS with a pushed filter
    ds = (spark.read.format("manifest_table").option("path", path).load()
          .where(F.col("id") >= 250))
    assert sorted(r.id for r in ds.collect()) == list(range(250, 400))

    # reader-level: the filter prunes file partitions before the scan
    schema = M.read_table(spark, path).schema
    r = ManifestBatchReader({"path": path}, schema)
    r.pushFilters([GreaterThanOrEqual(("id",), 250)])
    assert len(r.partitions()) == 2          # files [200,300) + [300,400)
    r2 = ManifestBatchReader({"path": path}, schema)
    r2.pushFilters([EqualTo(("id",), 7)])
    assert len(r2.partitions()) == 1
    r3 = ManifestBatchReader({"path": path}, schema)
    r3.pushFilters([])
    assert len(r3.partitions()) == 4

    # impossible range: zero partitions, zero rows, no error
    none = (spark.read.format("manifest_table").option("path", path)
            .load().where(F.col("id") > 1000))
    assert none.count() == 0


def test_dv_table_refuses_raw_datasource_read(registered, tmp_path):
    # the datasource hands Spark raw parquet files; a deletion-vector
    # snapshot must fail fast instead of resurrecting deleted rows
    spark = registered
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 5, "a"), path)
    M.delete_where_mor(spark, path, "id = 2")
    with pytest.raises(Exception, match="deletion vectors"):
        (spark.read.format("manifest_table")
         .option("path", path).load().collect())
    # compact materializes the DV away; the datasource works again
    M.compact(spark, path, target_files=1)
    out = (spark.read.format("manifest_table")
           .option("path", path).load())
    assert sorted(r.id for r in out.collect()) == [0, 1, 3, 4]
