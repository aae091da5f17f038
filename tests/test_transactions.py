"""Atomic multi-table transactions (sources/transactions.py) and the
txn-aware visibility resolution in sources/manifest.py."""

import os
import time

import pytest
from pyspark.sql import functions as F

from niamoto_spark.sources import manifest as M
from niamoto_spark.sources.transactions import (MultiTableTransaction,
                                                _marker, recover_stale)


def _df(spark, n, tag):
    return spark.createDataFrame(
        [(i, tag) for i in range(n)], "id int, tag string")


def test_commit_makes_all_tables_visible(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    txn_dir = str(tmp_path / "_txn")
    M.append(_df(spark, 3, "base"), a)
    M.append(_df(spark, 4, "base"), b)

    txn = MultiTableTransaction(txn_dir)
    txn.stage(_df(spark, 2, "new"), a)
    txn.stage(_df(spark, 5, "new"), b, mode="overwrite")
    versions = txn.commit()
    assert versions == {a: 1, b: 1}

    assert M.read_table(spark, a).count() == 5          # append
    assert M.read_table(spark, b).count() == 5          # overwrite
    assert M.read_table(spark, b).where(
        F.col("tag") == "base").count() == 0


def test_prepared_but_unmarked_is_invisible_and_blocks_writers(
        spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    txn_dir = str(tmp_path / "_txn")
    M.append(_df(spark, 3, "base"), a)
    M.append(_df(spark, 3, "base"), b)

    # drive the protocol by hand: BEGIN + PREPARE both tables, no marker
    txn = MultiTableTransaction(txn_dir)
    with open(_marker(txn_dir, txn.txn_id, "begin"), "w") as f:
        f.write(str(time.time()))
    txn._prepare_one(a, _df(spark, 2, "new"), "append")
    txn._prepare_one(b, _df(spark, 2, "new"), "append")

    # readers: still the base snapshot on both tables
    assert M.committed_version(a) == 0
    assert M.read_table(spark, a).count() == 3
    assert M.read_table(spark, b).count() == 3
    # single-table writers refuse to build past the pending claim
    with pytest.raises(M.TransactionInProgress):
        M.append(_df(spark, 1, "x"), a)

    # the one-file commit point flips BOTH tables at once
    txn._write_marker("committed")
    assert M.committed_version(a) == 1
    assert M.read_table(spark, a).count() == 5
    assert M.read_table(spark, b).count() == 5


def test_crash_recovery_aborts_and_unblocks(spark, tmp_path):
    a = str(tmp_path / "a")
    txn_dir = str(tmp_path / "_txn")
    M.append(_df(spark, 3, "base"), a)

    txn = MultiTableTransaction(txn_dir)
    with open(_marker(txn_dir, txn.txn_id, "begin"), "w") as f:
        f.write(str(time.time()))
    txn._prepare_one(a, _df(spark, 2, "lost"), "append")
    with pytest.raises(M.TransactionInProgress):
        M.append(_df(spark, 1, "x"), a)

    assert recover_stale(txn_dir, max_age_s=0.0) == [txn.txn_id]
    # husk version is routed around: writers work again, the crashed
    # transaction's rows never appear
    v = M.append(_df(spark, 1, "after"), a)
    assert v == 2                                 # slot 1 is the husk
    out = M.read_table(spark, a)
    assert out.count() == 4
    assert out.where(F.col("tag") == "lost").count() == 0
    # a late commit marker cannot resurrect the aborted transaction
    txn._write_marker("committed")
    assert M.read_table(spark, a).where(
        F.col("tag") == "lost").count() == 0


def test_slot_race_aborts_whole_transaction(spark, tmp_path, monkeypatch):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    txn_dir = str(tmp_path / "_txn")
    M.append(_df(spark, 3, "base"), a)
    M.append(_df(spark, 3, "base"), b)

    txn = MultiTableTransaction(txn_dir)
    txn.stage(_df(spark, 2, "new"), a)
    txn.stage(_df(spark, 2, "new"), b)

    # emulate the TOCTOU race: a concurrent writer claims b's next slot
    # BETWEEN the transaction's head read and its claim (a sorts first,
    # so a's claim succeeds and must end up an invisible husk)
    orig = M._writer_head
    fired = []

    def racy_head(path):
        slot, head = orig(path)
        if path == b and not fired:
            fired.append(True)
            M.append(_df(spark, 1, "race"), b)   # steals slot+1
        return slot, head

    monkeypatch.setattr(M, "_writer_head", racy_head)
    with pytest.raises(RuntimeError):
        txn.commit()
    monkeypatch.setattr(M, "_writer_head", orig)

    assert os.path.exists(_marker(txn_dir, txn.txn_id, "aborted"))
    assert M.read_table(spark, a).count() == 3       # husk invisible
    assert M.read_table(spark, b).count() == 4       # base + race row
    # both tables writable afterwards
    M.append(_df(spark, 1, "after"), a)
    assert M.read_table(spark, a).count() == 4


def test_cdc_and_diff_skip_husks(spark, tmp_path):
    a = str(tmp_path / "a")
    txn_dir = str(tmp_path / "_txn")
    M.append(_df(spark, 3, "base"), a)

    txn = MultiTableTransaction(txn_dir)
    with open(_marker(txn_dir, txn.txn_id, "begin"), "w") as f:
        f.write(str(time.time()))
    txn._prepare_one(a, _df(spark, 2, "lost"), "append")
    recover_stale(txn_dir, max_age_s=0.0)
    M.append(_df(spark, 2, "after"), a)

    changes = M.table_changes(spark, a, from_version=0)
    assert changes.count() == 2
    assert changes.where(F.col("tag") == "lost").count() == 0


def test_transaction_object_single_use(spark, tmp_path):
    txn = MultiTableTransaction(str(tmp_path / "_txn"))
    txn.stage(_df(spark, 1, "x"), str(tmp_path / "a"))
    txn.commit()
    with pytest.raises(RuntimeError):
        txn.commit()
    txn2 = MultiTableTransaction(str(tmp_path / "_txn"))
    txn2.stage(_df(spark, 1, "x"), str(tmp_path / "b"))
    with pytest.raises(ValueError):
        txn2.stage(_df(spark, 1, "y"), str(tmp_path / "b"))


def test_two_writer_append_race_real_threads(spark, tmp_path):
    """Two REAL concurrent writers appending to one table (VERDICT r8
    next-#7): the os.link version claim means exactly one wins each
    version slot; the loser sees RuntimeError and retries cleanly on a
    fresh head; the final table contains both batches exactly once."""
    import threading

    from niamoto_spark.sources import manifest as mf

    p = str(tmp_path / "t")
    mf.append(spark.createDataFrame([(0, "seed")], "id int, who string"), p)

    barrier = threading.Barrier(2)
    errors, retries = [], {"a": 0, "b": 0}

    def writer(tag, lo, hi):
        df = spark.createDataFrame(
            [(i, tag) for i in range(lo, hi)], "id int, who string")
        barrier.wait()
        for _ in range(10):
            try:
                mf.append(df, p)
                return
            except RuntimeError:
                retries[tag] += 1
        errors.append(f"{tag} never committed")

    ts = [threading.Thread(target=writer, args=("a", 10, 15)),
          threading.Thread(target=writer, args=("b", 20, 25))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
    assert mf.committed_version(p) == 2        # seed + two appends
    rows = sorted((r["id"], r["who"]) for r in
                  mf.read_table(spark, p).collect())
    assert rows == sorted([(0, "seed")]
                          + [(i, "a") for i in range(10, 15)]
                          + [(i, "b") for i in range(20, 25)])
    # version chain is linear: v1's parent is v0, v2's parent is v1
    assert mf._read_manifest(p, 1)["parent"] == 0
    assert mf._read_manifest(p, 2)["parent"] == 1
