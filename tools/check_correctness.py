"""Local replica of the driver's t2 correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, colnames):
    """Sort columns by name, stringify values with float rounding guard,
    sort rows -> comparable canonical form."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                # kill -0.0 and representation noise beyond 9dp
                v = round(v + 0.0, 9)
                if v == int(v) and abs(v) < 1e15:
                    v = int(v)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from niamoto_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(map(str.lower, scols)) != sorted(map(str.lower, ocols)):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            ns = normalize(srows, scols)
            no = normalize(orows, ocols)
            if ns != no:
                diff = [(a, b) for a, b in zip(ns, no) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{n_run - len(failures)}/{n_run} passing"
          + (f" (of {len(qs)} registered)" if n_run != len(qs) else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
