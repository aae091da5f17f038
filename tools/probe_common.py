"""Shared catalog-compare loop for the differential probe family
(null / dtype / order / split).

Every probe mutates the gate tables some way, then runs the identical
comparison: each queries() entry on Spark over the mutated dir vs its
oracle_sql() on DuckDB over the same bytes — columns, rowcount, then
order-insensitive normalized values.  Factored here so a comparison
fix (like this round's zip-pairing -> multiset first-diffs change)
lands in ONE place instead of five.
"""

from __future__ import annotations

import os
import sys
import time

from tools.check_correctness import normalize


def parse_args(argv: list, flags: dict, usage: str) -> tuple:
    """Shared probe argv parser with a real --help/unknown-flag guard.

    ``flags`` maps flag name -> (parser, default), e.g.
    ``{"rate": (float, 0.1), "seed": (int, 20261015)}``.  Returns
    (positional_args, values_dict).  ``--help``/``-h`` or any
    unrecognized ``--flag`` prints usage and exits — previously a bare
    startswith scan treated ``--help`` as data and started a full run
    (VERDICT r11 wrong-list #4)."""
    pos, vals = [], {k: d for k, (_, d) in flags.items()}
    for a in argv:
        if a in ("--help", "-h"):
            print(usage)
            raise SystemExit(0)
        if a.startswith("--"):
            name, _, raw = a[2:].partition("=")
            if name not in flags:
                print(f"unknown flag: {a}\n{usage}", file=sys.stderr)
                raise SystemExit(2)
            try:
                vals[name] = flags[name][0](raw)
            except ValueError:
                print(f"bad value for --{name}: {raw!r}\n{usage}",
                      file=sys.stderr)
                raise SystemExit(2)
        else:
            pos.append(a)
    return pos, vals


def first_diffs(ns: list, no: list, k: int = 3) -> tuple:
    """Multiset difference of two normalized row lists.

    A zip-based pairing misaligns every row after the first
    insertion/deletion, pointing the printed diff at the wrong rows;
    Counter subtraction reports exactly the rows unique to each side
    (multiplicity-aware, so duplicate-count-only diffs still show).
    """
    from collections import Counter

    cs, co = Counter(ns), Counter(no)
    return (sorted((cs - co).elements())[:k],
            sorted((co - cs).elements())[:k])


def chain_mutations(src_dir: str, dst_dir: str, steps) -> None:
    """Apply a sequence of table-mutation functions, each with the
    (src_dir, dst_dir) signature the probe family shares, threading
    intermediate results through temp dirs next to ``dst_dir``.

    Real 100 TB tables carry every probe axis AT ONCE — NULLs, mixed
    row order, many part files — and axis interactions (e.g. NULL keys
    at part-file boundaries) are invisible to the single-axis probes
    (VERDICT r11 next-#3).  The LAST step owns the final layout (e.g.
    split_tables turning each table into a part directory)."""
    import shutil
    import tempfile

    cur = src_dir
    tmps = []
    try:
        for i, step in enumerate(steps):
            out = dst_dir if i == len(steps) - 1 else tempfile.mkdtemp(
                prefix=f"chain{i}-", dir=os.path.dirname(dst_dir))
            if i < len(steps) - 1:
                tmps.append(out)
            step(cur, out)
            cur = out
    finally:
        for t in tmps:
            shutil.rmtree(t, ignore_errors=True)


def run_catalog(spark, con, qs, oracles, dst_dir: str, only: set,
                label: str = "", canon=None, oracle_cache=None) -> tuple:
    """Run every (queries, oracle) pair over the mutated tables.

    ``label`` prefixes each printed line (e.g. "int32/"); ``canon``
    optionally rewrites collected row tuples on BOTH sides before
    normalize (the decimal mutation's Decimal->float coarsening).
    ``oracle_cache`` (a dict the caller owns) memoizes DuckDB results
    across repeat runs over the SAME bytes — the plan probe re-runs the
    catalog under N Spark conf permutations, and the oracle side is
    plan-independent, so computing it once halves every later pass.
    Returns (failures, n_run)."""
    failures, n_run = [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, dst_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if canon:
                srows = canon(srows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {label}{name}: spark error: "
                  f"{str(e).splitlines()[0][:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {label}{name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            if oracle_cache is not None and name in oracle_cache:
                ocols, orows = oracle_cache[name]
            else:
                res = con.execute(oracles[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                if oracle_cache is not None:
                    oracle_cache[name] = (ocols, orows)
            if canon:
                orows = canon(orows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {label}{name}: duckdb error: "
                  f"{str(e).splitlines()[0][:300]}")
            failures.append(name)
            continue
        problems = []
        if sorted(map(str.lower, scols)) != sorted(map(str.lower, ocols)):
            problems.append(
                f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(
                f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            ns = normalize(srows, scols)
            no = normalize(orows, ocols)
            if ns != no:
                s_only, o_only = first_diffs(ns, no)
                problems.append(
                    f"values differ, spark-only: {s_only} "
                    f"oracle-only: {o_only}")
        if problems:
            print(f"FAIL {label}{name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK   {label}{name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
    return failures, n_run
