"""Maintenance and DML vs transaction husks (round-9 review findings).

A multi-table transaction (sources/transactions.py) that crashed or
aborted leaves a permanently-skipped husk manifest at the head; a
pending one blocks writers.  Every maintenance/DML entry point must
resolve the head through _writer_head / the committed chain — these
tests pin each one against a husk or a pending claim:

- vacuum: the keep window counts COMMITTED snapshots, so an aborted
  head cannot evict the only live snapshot (data loss), and a pending
  head's files survive (it may still commit).
- delete_where / update_where / compact: raise TransactionInProgress
  on a pending head instead of silently publishing or dropping the
  transaction's rows; build from the committed doc past aborted husks.
- compact_where / delete_where_mor: claim the slot after the RAW head
  (an aborted husk at committed+1 previously collided forever).
- append_with_blooms: must not carry a husk's never-visible files.
- restore_version: refuses to resurrect an aborted/pending version.
- shallow_clone / wap_stage+publish: per-file stats ride along, so
  pruning still works on the clone / published snapshot.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from niamoto_spark.sources import manifest as M
from niamoto_spark.sources.transactions import (MultiTableTransaction,
                                                _marker)


def _df(spark, lo, n, tag):
    return spark.createDataFrame(
        [(lo + i, tag) for i in range(n)], "id int, tag string")


def _claim(spark, path, txn_dir, df, mode="append", abort=False):
    """Drive the 2PC protocol by hand up to (and optionally past) a
    single-table PREPARE, leaving a pending claim or an aborted husk
    at the table head."""
    txn = MultiTableTransaction(txn_dir)
    with open(_marker(txn_dir, txn.txn_id, "begin"), "w") as f:
        f.write(str(time.time()))
    txn._prepare_one(path, df, mode)
    if abort:
        txn._write_marker("aborted")
    return txn


def test_vacuum_aborted_head_keeps_live_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 3, "base"), path)            # v0
    M.append(_df(spark, 10, 2, "more"), path)           # v1
    _claim(spark, path, str(tmp_path / "_txn"),
           _df(spark, 100, 2, "lost"), mode="overwrite", abort=True)  # v2

    husk_files = M._read_manifest(path, 2)["files"]
    deleted = M.vacuum(path, keep_versions=1, retention_sec=0.0)
    # the live snapshot (v1) survives the keep window even though the
    # raw head is the husk; the husk's never-visible files are reaped
    out = M.read_table(spark, path)
    assert out.count() == 5
    assert out.where(F.col("tag") == "lost").count() == 0
    assert all(not os.path.exists(f) for f in husk_files)
    assert deleted >= len(husk_files)
    # the husk manifest itself is retained (parent walks route through
    # it), so the table stays writable at the next raw slot
    assert M.append(_df(spark, 20, 1, "after"), path) == 3


def test_vacuum_pending_head_preserves_both_sides(spark, tmp_path):
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 3, "base"), path)            # v0
    txn = _claim(spark, path, str(tmp_path / "_txn"),
                 _df(spark, 100, 2, "pend"), mode="overwrite")  # v1 pending

    M.vacuum(path, keep_versions=1, retention_sec=0.0)
    # committed snapshot still readable, pending files still on disk
    assert M.read_table(spark, path).count() == 3
    txn._write_marker("committed")
    out = M.read_table(spark, path)
    assert out.count() == 2
    assert out.where(F.col("tag") == "pend").count() == 2


def test_cow_dml_raises_on_pending_head(spark, tmp_path):
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 3, "base"), path)
    _claim(spark, path, str(tmp_path / "_txn"), _df(spark, 100, 2, "pend"))
    with pytest.raises(M.TransactionInProgress):
        M.delete_where(spark, path, "id = 1")
    with pytest.raises(M.TransactionInProgress):
        M.update_where(spark, path, "id = 1", {"tag": F.lit("x")})
    with pytest.raises(M.TransactionInProgress):
        M.compact(spark, path, target_files=1)


def test_cow_dml_skips_aborted_husk(spark, tmp_path):
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 3, "base"), path)            # v0
    _claim(spark, path, str(tmp_path / "_txn"),
           _df(spark, 100, 2, "lost"), abort=True)      # v1 husk
    v = M.delete_where(spark, path, "id = 1")
    assert v == 2                                       # slot after husk
    out = M.read_table(spark, path)
    assert out.count() == 2
    # the husk's staged files must not have been pulled into the commit
    assert out.where(F.col("tag") == "lost").count() == 0


def test_compact_where_and_mor_claim_past_husk(spark, tmp_path):
    path = str(tmp_path / "t")
    M.append_with_stats(_df(spark, 0, 3, "a"), path, ["id"])    # v0
    _claim(spark, path, str(tmp_path / "_txn"),
           _df(spark, 100, 2, "lost"), abort=True)              # v1 husk
    v, n_new, _ = M.compact_where(spark, path, "id", 0, 10)
    assert v == 2 and n_new >= 1
    assert M.read_table(spark, path).count() == 3

    _claim(spark, path, str(tmp_path / "_txn2"),
           _df(spark, 200, 2, "lost2"), abort=True)             # v3 husk
    v, n_del = M.delete_where_mor(spark, path, "id = 0")
    assert v == 4 and n_del == 1
    assert M.read_table(spark, path).count() == 2


def test_append_with_blooms_skips_aborted_husk(spark, tmp_path):
    path = str(tmp_path / "t")
    M.append_with_blooms(_df(spark, 0, 3, "base"), path, ["tag"])  # v0
    _claim(spark, path, str(tmp_path / "_txn"),
           _df(spark, 100, 2, "lost"), abort=True)                 # v1
    M.append_with_blooms(_df(spark, 10, 2, "more"), path, ["tag"])  # v2
    out = M.read_table(spark, path)
    assert out.count() == 5
    assert out.where(F.col("tag") == "lost").count() == 0


def test_restore_version_refuses_husks_and_pending(spark, tmp_path):
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 3, "base"), path)            # v0
    _claim(spark, path, str(tmp_path / "_txn"),
           _df(spark, 100, 2, "lost"), abort=True)      # v1 husk
    M.append(_df(spark, 10, 1, "more"), path)           # v2
    with pytest.raises(ValueError, match="aborted"):
        M.restore_version(path, 1)
    assert M.restore_version(path, 0) == 3
    assert M.read_table(spark, path).count() == 3

    _claim(spark, path, str(tmp_path / "_txn2"),
           _df(spark, 200, 1, "pend"))                  # v4 pending
    with pytest.raises(M.TransactionInProgress):
        M.restore_version(path, 0)


def test_shallow_clone_carries_zone_maps(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    M.append_with_stats(_df(spark, 0, 5, "lo").coalesce(1), src, ["id"])
    M.append_with_stats(_df(spark, 100, 5, "hi").coalesce(1), src, ["id"])
    M.shallow_clone(src, dst)
    _, kept, skipped = M.read_table_pruned(spark, dst, "id", 0, 10)
    assert kept == 1 and skipped == 1


def test_wap_publish_preserves_zone_maps(spark, tmp_path):
    path = str(tmp_path / "t")
    M.append_with_stats(_df(spark, 0, 5, "lo").coalesce(1), path, ["id"])
    M.wap_stage(_df(spark, 100, 5, "hi").coalesce(1), path, "audit")
    M.wap_publish(path, "audit")
    df, kept, skipped = M.read_table_pruned(spark, path, "id", 0, 10)
    # the carried base file's stats survive publish: the staged file
    # (no stats) is conservatively read, the base file is prunable
    assert kept >= 1
    assert df.count() == 5
    _, kept2, skipped2 = M.read_table_pruned(spark, path, "id", 100, 110)
    assert skipped2 == 1  # base file skipped via its carried zone map


def test_stream_batch_idempotence_survives_foreign_commits(spark, tmp_path):
    """A foreign writer landing after a stream batch's commit pushes the
    batch_id record off the head; a crash-replay of that batch must
    still be recognized as committed (head-only checking double-appended
    it)."""
    path = str(tmp_path / "t")
    M.append(_df(spark, 0, 3, "b7"), path, extra_meta={"batch_id": 7})
    M.append(_df(spark, 10, 2, "foreign"), path)       # no batch_id
    M.compact(spark, path, target_files=1)              # also no batch_id
    assert M._last_batch_id(path) == 7
    # an older/newer batch id is NOT the last one -> would commit
    assert M._last_batch_id(path) != 8
