"""NULL-injection differential harness.

Rounds 8-9 fixed SIX hand-found instances of one defect shape: NULL
silently absorbed by ``F.least`` / ``xxhash64`` / ternaries (CSR traits,
histogram stumps, quantile_normalize, table_cdf, table_diff,
beta_partition).  This tool mechanizes that hunt: it builds a NULL-seeded
copy of the gate tables (a fixed fraction of every column nulled, fixed
seed, identical bytes for Spark and DuckDB) and re-runs the full
queries()/oracle_sql() catalog over it.  Any Spark-vs-DuckDB divergence
on the SAME nulled input is a failing row — NULL semantics disagreements
are exactly the bug class.

Usage:
    python tools/null_probe.py [sf_dir] [query_name ...]
    python tools/null_probe.py /root/testdata/sf0.001 --rate 0.1

The injected copy is written to /tmp/null_probe/<sf-name>-r<rate>/ and
reused if already present (delete it to regenerate).

Known-benign divergence sources the probe intentionally still reports
(fix the query, don't whitelist here): ORDER BY ... LIMIT over a
now-nullable key (Spark sorts NULLS FIRST asc, DuckDB NULLS LAST —
the query must pin NULL placement on both sides).
"""

from __future__ import annotations

import os
import shutil
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES  # noqa: E402
from tools.probe_common import first_diffs, run_catalog  # noqa: E402,F401  (first_diffs re-exported for tests)

# Columns a probe run never nulls: none by default — NULL anywhere is fair
# game because BOTH engines see the identical nulled bytes.  Kept as a knob
# for scoped debugging runs (e.g. SKIP={"l_orderkey"} to isolate a lane).
SKIP_COLUMNS: set = set()


def inject_nulls(src_dir: str, dst_dir: str, rate: float, seed: int) -> None:
    """Write a NULL-seeded copy of every gate table.

    Determinism: each (table, column) gets its own numpy PCG64 stream
    seeded from crc32 (process-stable, unlike the salted builtin hash),
    so the same (src, rate, seed) always yields byte-identical output —
    the probe is reproducible across runs and machines.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        tbl = pq.read_table(src)
        n = len(tbl)
        arrays, fields = [], []
        for i, name in enumerate(tbl.column_names):
            field = tbl.schema.field(i)
            col = tbl.column(i).combine_chunks()
            if name in SKIP_COLUMNS or n == 0:
                arrays.append(col)
                fields.append(field)
                continue
            stream_seed = zlib.crc32(f"{seed}:{t}:{name}".encode())
            rng = np.random.default_rng(stream_seed)
            keep = pa.array(rng.random(n) >= rate)
            nulled = pc.if_else(keep, col, pa.nulls(n, field.type))
            arrays.append(nulled)
            fields.append(pa.field(name, field.type, nullable=True))
        out = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        pq.write_table(out, os.path.join(dst_dir, f"{t}.parquet"))


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from niamoto_spark.session import get_spark

    from tools.probe_common import parse_args
    args, vals = parse_args(
        sys.argv[1:], {"rate": (float, 0.1), "seed": (int, 20261015)},
        "usage: python tools/null_probe.py [sf_dir] [query_name ...] "
        "[--rate=R] [--seed=N]")
    rate, seed = vals["rate"], vals["seed"]
    src_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    tag = f"{os.path.basename(src_dir.rstrip('/'))}-r{rate}-s{seed}"
    dst_dir = os.path.join("/tmp/null_probe", tag)
    marker = os.path.join(dst_dir, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(dst_dir, ignore_errors=True)
        print(f"injecting NULLs: {src_dir} -> {dst_dir} (rate={rate})")
        inject_nulls(src_dir, dst_dir, rate, seed)
        open(marker, "w").close()
    else:
        print(f"reusing injected tables at {dst_dir}")

    spark = get_spark("null_probe")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dst_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, n_run = run_catalog(spark, con, qs, oracles, dst_dir, only)
    print(f"\n{n_run - len(failures)}/{n_run} passing under NULL injection"
          + (f" (of {len(qs)} registered)" if n_run != len(qs) else ""))
    if failures:
        print("failing:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
