"""Row-order permutation differential harness (round-11 extension of
the null/dtype probe recipe).

At 100 TB, parquet row order is an accident of the writer: scans split
files, tasks finish out of order, and AQE re-plans — an operator whose
result depends on PHYSICAL row order (monotonically_increasing_id
tiebreaks, first()-without-order, head-of-file assumptions) is a
latent wrong-results bug that small single-file tests never trip.

This tool rewrites every gate table with its rows in a seeded shuffled
order (same bytes, same multiset, both engines read the identical
shuffled file) and re-runs the queries()/oracle_sql() catalog.  Any
divergence is order dependence in one engine's expression of the
semantics.

Usage:
    python tools/order_probe.py [sf_dir] [query_name ...]
    python tools/order_probe.py /root/testdata/sf0.001 --seed=7

Shuffled copies land in /tmp/order_probe/<sf>-s<seed>/ and are reused
when present (delete to regenerate).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES  # noqa: E402
from tools.probe_common import run_catalog  # noqa: E402


def shuffle_tables(src_dir: str, dst_dir: str, seed: int) -> None:
    """Write a row-permuted copy of every gate table (deterministic:
    one PCG64 permutation per table, crc32-derived stream)."""
    import zlib

    import numpy as np
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        rng = np.random.default_rng(zlib.crc32(f"{seed}:{t}".encode()))
        perm = rng.permutation(len(tbl))
        pq.write_table(tbl.take(perm),
                       os.path.join(dst_dir, f"{t}.parquet"))


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from niamoto_spark.session import get_spark

    from tools.probe_common import parse_args
    args, vals = parse_args(
        sys.argv[1:], {"seed": (int, 20261116)},
        "usage: python tools/order_probe.py [sf_dir] [query_name ...] "
        "[--seed=N]")
    seed = vals["seed"]
    src_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    tag = f"{os.path.basename(src_dir.rstrip('/'))}-s{seed}"
    dst_dir = os.path.join("/tmp/order_probe", tag)
    marker = os.path.join(dst_dir, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(dst_dir, ignore_errors=True)
        print(f"shuffling rows: {src_dir} -> {dst_dir} (seed={seed})")
        shuffle_tables(src_dir, dst_dir, seed)
        open(marker, "w").close()
    else:
        print(f"reusing shuffled tables at {dst_dir}")

    spark = get_spark("order_probe")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dst_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, n_run = run_catalog(spark, con, qs, oracles, dst_dir, only)
    print(f"\n{n_run - len(failures)}/{n_run} passing under row permutation"
          + (f" (of {len(qs)} registered)" if n_run != len(qs) else ""))
    if failures:
        print("failing:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
