"""Composed-mutation differential harness (VERDICT r11 next-#3).

The single-axis probes each mutate ONE accident of real data — NULLs
(null_probe), dtypes (dtype_probe), row order (order_probe), multi-file
layout (split_probe), physical plan (plan_probe).  Real 100 TB tables
have ALL of those at once, and axis interactions are a distinct bug
class: NULL join keys landing at part-file boundaries, shuffled rows
changing which part file a NULL block sits in, streaming sources
draining mutated part files in a different order.  None of that is
reachable by any single-axis run.

This tool stacks NULL injection (rate, seed) + row permutation (seed)
+ multi-file split (parts) into ONE mutated dataset — both engines read
the identical stacked bytes — and re-runs the full
queries()/oracle_sql() catalog over it.

Usage:
    python tools/composed_probe.py [sf_dir] [query_name ...]
    python tools/composed_probe.py /root/testdata/sf0.01 --rate=0.1 \
        --seed=7 --parts=4

The stacked copy lands in /tmp/composed_probe/<tag>/ and is reused when
present (delete to regenerate).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES  # noqa: E402
from tools.null_probe import inject_nulls  # noqa: E402
from tools.order_probe import shuffle_tables  # noqa: E402
from tools.probe_common import (chain_mutations, parse_args,  # noqa: E402
                                run_catalog)
from tools.split_probe import split_tables  # noqa: E402

USAGE = ("usage: python tools/composed_probe.py [sf_dir] "
         "[query_name ...] [--rate=R] [--seed=N] [--parts=P]")


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from niamoto_spark.session import get_spark

    args, vals = parse_args(
        sys.argv[1:],
        {"rate": (float, 0.1), "seed": (int, 20261212),
         "parts": (int, 4)}, USAGE)
    rate, seed, parts = vals["rate"], vals["seed"], vals["parts"]
    src_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    tag = (f"{os.path.basename(src_dir.rstrip('/'))}"
           f"-r{rate}-s{seed}-p{parts}")
    dst_dir = os.path.join("/tmp/composed_probe", tag)
    marker = os.path.join(dst_dir, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(dst_dir, ignore_errors=True)
        os.makedirs(dst_dir, exist_ok=True)
        print(f"stacking NULL(r={rate}) + shuffle(s={seed}) + "
              f"split(p={parts}): {src_dir} -> {dst_dir}")
        chain_mutations(src_dir, dst_dir, [
            lambda s, d: inject_nulls(s, d, rate, seed),
            lambda s, d: shuffle_tables(s, d, seed),
            lambda s, d: split_tables(s, d, parts),
        ])
        open(marker, "w").close()
    else:
        print(f"reusing stacked tables at {dst_dir}")

    spark = get_spark("composed_probe")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{dst_dir}/{t}.parquet/*.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, n_run = run_catalog(spark, con, qs, oracles, dst_dir, only)
    print(f"\n{n_run - len(failures)}/{n_run} passing under composed "
          "mutation"
          + (f" (of {len(qs)} registered)" if n_run != len(qs) else ""))
    if failures:
        print("failing:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
