"""Plan-shape permutation differential harness (VERDICT r11 next-#1).

Round 11 proved that Catalyst rewrites can silently change RESULTS,
not just speed, when the physical plan flips: q308's correlated
LATERAL, given an implicit-cast equality, decorrelates with the
per-group LIMIT planned as a GLOBAL TakeOrderedAndProject below the
join (stock Spark 4.1 — worked around at queries.py q308 by aligning
view dtypes).  That miscompile was surfaced by a *dtype* mutation
flipping the plan; every other lane is certified under exactly ONE
plan shape — the session defaults in niamoto_spark/session.py.

This tool re-runs the full queries()/oracle_sql() catalog under Spark
conf permutations that change the PHYSICAL plan while leaving the
semantics fixed — so any Spark-vs-DuckDB divergence that appears under
one permutation and not the baseline is a plan-sensitive wrong-results
bug (Catalyst miscompile, or engine code that leaks plan artifacts
like partition count / broadcast side / codegen state into values):

  noaqe        adaptive execution off — no runtime coalescing, no
               skew-join splitting, no AQE re-planning of join
               strategies; the static plan runs as compiled.
  nobroadcast  autoBroadcastJoinThreshold=-1 — every equi-join becomes
               sort-merge (or shuffled-hash), the 100 TB shape where
               dims stop fitting in memory; also disables the
               broadcast-side row-dedup semantics BHJ implies.
  shuffle1     spark.sql.shuffle.partitions=1 — single-partition
               shuffles: exposes code assuming >1 partition, and makes
               any per-partition nondeterminism collapse differently.
  shuffle7     spark.sql.shuffle.partitions=7 — a prime, co-prime with
               every key cardinality in the gate data: every hash
               partitioning lands rows differently than the 32-way
               baseline.
  nocodegen    whole-stage codegen off — the interpreted expression
               path, which Spark maintains in parallel with Janino
               codegen; divergence = a codegen-vs-interpreted bug.
  combo        noaqe + nobroadcast + shuffle7 + nocodegen stacked —
               interactions between the axes.

All five confs are runtime-settable SQL confs, flipped via
spark.conf.set between passes and restored after; the DuckDB oracle is
plan-independent so it is computed ONCE and reused across passes
(probe_common.run_catalog oracle_cache).

The probe runs over UNMUTATED gate bytes by default, but the sf_dir
positional accepts any probe-mutated directory (e.g.
/tmp/dtype_probe/sf0.001-strkeys) so plan-shape and data mutations can
be STACKED — that exact stack (strkeys x any permutation) reproduces
the q308 miscompile when its dtype-alignment guard is removed, which
is this probe's bidirectional validation
(tests/test_plan_probe.py::test_probe_catches_lateral_miscompile).

Usage:
    python tools/plan_probe.py [sf_dir] [query_name ...]
    python tools/plan_probe.py /root/testdata/sf0.001 --perms=noaqe,combo
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES  # noqa: E402
from tools.probe_common import parse_args, run_catalog  # noqa: E402

PERMUTATIONS = {
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "nobroadcast": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    "shuffle1": {"spark.sql.shuffle.partitions": "1"},
    "shuffle7": {"spark.sql.shuffle.partitions": "7"},
    "nocodegen": {"spark.sql.codegen.wholeStage": "false"},
    "combo": {"spark.sql.adaptive.enabled": "false",
              "spark.sql.autoBroadcastJoinThreshold": "-1",
              "spark.sql.shuffle.partitions": "7",
              "spark.sql.codegen.wholeStage": "false"},
}

USAGE = (
    "usage: python tools/plan_probe.py [sf_dir] [query_name ...] "
    "[--perms=p1,p2]\n"
    f"  permutations: {','.join(PERMUTATIONS)} (default: all)\n"
    "  sf_dir may be a probe-mutated directory (tables may be\n"
    "  single files or <t>.parquet/ part directories)"
)


def _canon(rows):
    """Decimal -> float on both sides, so the probe also accepts the
    dtype probe's decimal-mutated directories (no-op on stock gate
    bytes, which carry no DECIMAL columns)."""
    import decimal

    return [tuple(float(v) if isinstance(v, decimal.Decimal) else v
                  for v in row) for row in rows]


def run_permutation(spark, con, qs, oracles, sf_dir, only, perm,
                    oracle_cache) -> list:
    confs = PERMUTATIONS[perm]
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        failures, n_run = run_catalog(
            spark, con, qs, oracles, sf_dir, only,
            label=f"{perm}/", canon=_canon, oracle_cache=oracle_cache)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    print(f"\n[{perm}] {n_run - len(failures)}/{n_run} passing")
    return failures


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from niamoto_spark.session import get_spark

    pos, vals = parse_args(
        sys.argv[1:], {"perms": (str, ",".join(PERMUTATIONS))}, USAGE)
    perms = [p for p in vals["perms"].split(",") if p]
    bad = [p for p in perms if p not in PERMUTATIONS]
    if bad:
        print(f"unknown permutation(s): {' '.join(bad)}\n{USAGE}",
              file=sys.stderr)
        return 2
    sf_dir = pos[0] if pos else "/root/testdata/sf0.001"
    only = set(pos[1:])

    spark = get_spark("plan_probe")
    con = duckdb.connect()
    for t in TABLES:
        # accept both single-file tables and split-probe part dirs
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    oracle_cache: dict = {}
    all_failures = {}
    for perm in perms:
        fails = run_permutation(spark, con, qs, oracles, sf_dir, only,
                                perm, oracle_cache)
        if fails:
            all_failures[perm] = fails

    if all_failures:
        for p, fails in all_failures.items():
            print(f"failing[{p}]:", " ".join(fails))
        return 1
    print("\nall plan permutations green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
