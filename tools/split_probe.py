"""Multi-file table differential harness (round-11 probe family).

Every gate table ships as ONE parquet file, but at real scale every
table is a DIRECTORY of part files — and code that treats the table
path as a single file (symlinking it into a stream dir, stat'ing it,
schema-reading "the" file) silently breaks the day the data is written
by more than one task.  This tool rewrites each gate table as a
directory ``{t}.parquet/`` holding N row-chunks (original row order
preserved across chunk boundaries; the order probe covers shuffling)
and re-runs the full queries()/oracle_sql() catalog, with DuckDB
reading the same parts via glob.

Usage:
    python tools/split_probe.py [sf_dir] [query_name ...]
    python tools/split_probe.py /root/testdata/sf0.001 --parts=4
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES  # noqa: E402
from tools.probe_common import run_catalog  # noqa: E402


def split_tables(src_dir: str, dst_dir: str, parts: int) -> None:
    """Write each gate table as a directory of ``parts`` part files,
    rows in original order (deterministic chunking)."""
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        tdir = os.path.join(dst_dir, f"{t}.parquet")
        os.makedirs(tdir, exist_ok=True)
        n = len(tbl)
        step = max(1, (n + parts - 1) // parts)
        for i in range(parts):
            chunk = tbl.slice(i * step, step)
            if len(chunk) == 0 and i > 0:
                continue
            pq.write_table(chunk, os.path.join(
                tdir, f"part-{i:05d}.parquet"))


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from niamoto_spark.session import get_spark

    from tools.probe_common import parse_args
    args, vals = parse_args(
        sys.argv[1:], {"parts": (int, 4)},
        "usage: python tools/split_probe.py [sf_dir] [query_name ...] "
        "[--parts=N]")
    parts = vals["parts"]
    src_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    tag = f"{os.path.basename(src_dir.rstrip('/'))}-p{parts}"
    dst_dir = os.path.join("/tmp/split_probe", tag)
    marker = os.path.join(dst_dir, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(dst_dir, ignore_errors=True)
        print(f"splitting: {src_dir} -> {dst_dir} ({parts} parts)")
        split_tables(src_dir, dst_dir, parts)
        open(marker, "w").close()
    else:
        print(f"reusing split tables at {dst_dir}")

    spark = get_spark("split_probe")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{dst_dir}/{t}.parquet/*.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, n_run = run_catalog(spark, con, qs, oracles, dst_dir, only)
    print(f"\n{n_run - len(failures)}/{n_run} passing on multi-file tables"
          + (f" (of {len(qs)} registered)" if n_run != len(qs) else ""))
    if failures:
        print("failing:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
