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

import time

from tools.check_correctness import normalize


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


def run_catalog(spark, con, qs, oracles, dst_dir: str, only: set,
                label: str = "", canon=None) -> tuple:
    """Run every (queries, oracle) pair over the mutated tables.

    ``label`` prefixes each printed line (e.g. "int32/"); ``canon``
    optionally rewrites collected row tuples on BOTH sides before
    normalize (the decimal mutation's Decimal->float coarsening).
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
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
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
