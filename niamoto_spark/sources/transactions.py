"""Atomic multi-table transactions over manifest tables — commit
snapshots to SEVERAL tables such that readers see either all of them or
none of them.

Why it matters at 100 TB: curation pipelines write families of derived
tables (documents + stats + shard index; fact + aggregate) whose
consumers join them.  Per-table atomicity (sources/manifest.py) still
lets a reader join table A's new snapshot against table B's old one.

Protocol (write-side two-phase, read-side resolution — the same shape
as a catalog-coordinated commit in the lakehouse literature):

1. BEGIN   — a ``txn-<id>.begin`` marker records the transaction and
             its start time (crash-recovery clock).
2. PREPARE — for each table (in sorted path order), data files are
             staged and the table's next manifest slot is CLAIMED with
             a normal atomic-link commit whose document carries
             (txn_id, txn_dir).  Claimed-but-unmarked manifests are
             invisible: readers resolve visibility through
             manifest._txn_state, and single-table writers refuse to
             build past them (TransactionInProgress) so a later commit
             cannot orphan the transaction's rows.
3. COMMIT  — ONE ``txn-<id>.committed`` marker file, created with
             O_CREAT|O_EXCL.  This single atomic filesystem operation
             flips every claimed manifest to visible at once.
4. ABORT   — on any prepare failure (e.g. a concurrent single-table
             writer won a slot race) a ``txn-<id>.aborted`` marker is
             written; claimed slots become permanently-skipped husks
             (parent pointers route around them) and staged files are
             vacuum bait.

Crash matrix: before any claim -> nothing visible, begin marker ages
out; between claims -> pending slots block writers until
``recover_stale`` abandons the transaction (begin-marker age check);
after the committed marker -> fully committed everywhere, by
construction.  There is no window in which a subset of tables is
visible.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame

from niamoto_spark.sources import manifest as M


def _marker(txn_dir: str, txn_id: str, state: str) -> str:
    return os.path.join(txn_dir, f"txn-{txn_id}.{state}")


class MultiTableTransaction:
    """Collect per-table writes, then commit them all atomically.

    Usage::

        txn = MultiTableTransaction(txn_dir)
        txn.stage(df_a, path_a)             # append semantics
        txn.stage(df_b, path_b, mode="overwrite")
        txn.commit()                        # all-or-nothing

    ``stage`` only records intent; all writing happens inside
    ``commit``.  A transaction object is single-use.
    """

    def __init__(self, txn_dir: str):
        os.makedirs(txn_dir, exist_ok=True)
        self.txn_dir = txn_dir
        self.txn_id = uuid.uuid4().hex
        self._staged: list[tuple[str, DataFrame, str]] = []
        self._done = False

    def stage(self, df: DataFrame, table_path: str,
              mode: str = "append") -> None:
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        if any(p == table_path for p, _, _ in self._staged):
            raise ValueError(f"table staged twice: {table_path}")
        self._staged.append((table_path, df, mode))

    def commit(self) -> dict[str, int]:
        """Run the protocol; returns {table_path: committed_version}.

        Raises (after writing the abort marker) if any table's slot
        claim loses a race — the caller retries the whole transaction
        against the new table heads."""
        if self._done:
            raise RuntimeError("transaction object is single-use")
        self._done = True
        if not self._staged:
            return {}
        with open(_marker(self.txn_dir, self.txn_id, "begin"), "w") as f:
            f.write(str(time.time()))

        versions: dict[str, int] = {}
        try:
            # deterministic table order: concurrent multi-table
            # transactions touching the same tables conflict on the
            # FIRST shared table instead of deadlock-shaped interleaving
            for path, df, mode in sorted(self._staged,
                                         key=lambda t: t[0]):
                versions[path] = self._prepare_one(path, df, mode)
        except BaseException:
            self._write_marker("aborted")
            raise
        self._write_marker("committed")
        # aborted-wins resolution (manifest._txn_state): if crash
        # recovery aborted this transaction while we were preparing,
        # our commit marker is moot — report the failure
        if os.path.exists(_marker(self.txn_dir, self.txn_id, "aborted")):
            raise RuntimeError(
                f"transaction {self.txn_id} was aborted by stale-"
                "transaction recovery before its commit marker landed")
        return versions

    def abort(self) -> None:
        """Explicitly abandon the transaction (idempotent)."""
        if not os.path.exists(_marker(self.txn_dir, self.txn_id,
                                      "committed")):
            self._write_marker("aborted")

    # -- internals ----------------------------------------------------

    def _write_marker(self, state: str) -> None:
        m = _marker(self.txn_dir, self.txn_id, state)
        try:
            fd = os.open(m, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return
        try:
            os.write(fd, str(time.time()).encode())
            os.fsync(fd)
        finally:
            os.close(fd)

    def _prepare_one(self, path: str, df: DataFrame, mode: str) -> int:
        data, _ = M._table_dirs(path)
        staging = os.path.join(data, f"txn-{self.txn_id}-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        new_files = [os.path.join(staging, f) for f in os.listdir(staging)
                     if f.endswith(".parquet")]
        # raises TransactionInProgress if ANOTHER transaction holds the
        # head — transactions serialize per table
        parent, head = M._writer_head(path)
        files = (sorted(head.get("files", []) + new_files)
                 if mode == "append" else sorted(new_files))
        M._commit_doc(path, parent + 1,
                      {"parent": parent, "files": files,
                       "txn_id": self.txn_id, "txn_dir": self.txn_dir})
        return parent + 1


def recover_stale(txn_dir: str, max_age_s: float = 3600.0) -> list[str]:
    """Abort transactions that BEGAN more than ``max_age_s`` ago and
    never reached a committed/aborted marker — crashed coordinators.
    Returns the txn ids aborted.  Safe to run any time: a live
    transaction younger than the threshold is left alone, and the
    marker create is O_EXCL, and state resolution checks 'aborted'
    FIRST, so even if a slow coordinator's committed marker lands after
    a recovery abort, the abort wins (the coordinator detects this and
    raises).  Use a threshold well above any real commit duration."""
    now = time.time()
    aborted = []
    if not os.path.isdir(txn_dir):
        return aborted
    for f in os.listdir(txn_dir):
        if not (f.startswith("txn-") and f.endswith(".begin")):
            continue
        tid = f[len("txn-"):-len(".begin")]
        if (os.path.exists(_marker(txn_dir, tid, "committed")) or
                os.path.exists(_marker(txn_dir, tid, "aborted"))):
            continue
        try:
            age = now - os.path.getmtime(os.path.join(txn_dir, f))
        except OSError:
            continue
        if age > max_age_s:
            try:
                fd = os.open(_marker(txn_dir, tid, "aborted"),
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                aborted.append(tid)
            except FileExistsError:
                pass
    return aborted
