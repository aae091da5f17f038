"""Manifest-committed table format (sources/manifest.py): atomicity,
snapshot isolation, time travel, vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from niamoto_spark.sources import manifest as M


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 2)


def test_append_versions_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = M.append(_df(spark, 0, 10), t)
    v1 = M.append(_df(spark, 10, 15), t)
    assert (v0, v1) == (0, 1)
    assert M.read_table(spark, t).count() == 15            # latest
    assert M.read_table(spark, t, version=0).count() == 10  # time travel
    assert M.current_version(t) == 1


def test_overwrite_replaces_but_keeps_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(_df(spark, 0, 10), t)
    M.overwrite(_df(spark, 100, 103), t)
    assert sorted(r["id"] for r in M.read_table(spark, t).collect()) \
        == [100, 101, 102]
    assert M.read_table(spark, t, version=0).count() == 10


def test_crashed_writer_files_invisible(spark, tmp_path):
    """Data files staged without a manifest commit must never appear to
    readers — the torn-write guarantee."""
    t = str(tmp_path / "tbl")
    M.append(_df(spark, 0, 10), t)
    # simulate a crash: files land in data/, no commit happens
    orphan_dir = os.path.join(t, "data", "txn-deadbeef")
    _df(spark, 500, 600).write.parquet(orphan_dir)
    assert M.read_table(spark, t).count() == 10
    # vacuum reaps the orphans
    deleted = M.vacuum(t, keep_versions=1)
    assert deleted > 0
    assert not os.path.exists(orphan_dir)
    assert M.read_table(spark, t).count() == 10


def test_vacuum_keeps_requested_versions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(_df(spark, 0, 5), t)
    M.overwrite(_df(spark, 10, 12), t)
    M.overwrite(_df(spark, 20, 21), t)
    M.vacuum(t, keep_versions=2)
    assert M.read_table(spark, t).count() == 1
    assert M.read_table(spark, t, version=1).count() == 2
    with pytest.raises(FileNotFoundError):
        M.read_table(spark, t, version=0)


def test_version_collision_detected(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(_df(spark, 0, 5), t)
    # another writer claims version 1 out from under us
    M._commit(t, 1, [], parent=0)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        M._commit(t, 1, [], parent=0)


def test_read_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        M.read_table(spark, str(tmp_path / "never_written"))
