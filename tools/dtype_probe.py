"""Dtype-permutation differential harness (VERDICT r10 next-#2).

Round 10's worst near-miss was found by REVIEW, not by a harness:
``hashed_dim_join`` hashed both sides with xxhash64, which is
type-sensitive — a string-coded fact key against a bigint dim key
silently dropped every row.  The NULL probe mechanizes NULL-absorption
bugs; this tool mechanizes the dtype-assumption bug class the same way:
rewrite the gate parquet under a dtype mutation (identical bytes for
Spark and DuckDB) and re-run the full queries()/oracle_sql() catalog.
Any divergence on the same mutated input is an engine-side dtype
assumption.

Three mutations (run all by default, or pick with --mutation=NAME):

  int32    every BIGINT/INTEGER column whose values fit is narrowed to
           INT32 — catches code that assumes LongType (hash paths,
           schema pattern-matches, pandas dtype maps).
  strkeys  join keys string-coded on ONE side, in BOTH mismatch
           directions (dim-side PKs r_regionkey/c_custkey/p_partkey
           with integral fact FKs, AND fact-side FKs c_nationkey/
           l_suppkey with integral dim PKs) — the exact ADVICE-r10#1
           hole (mismatched-dtype joins must fall back to implicit-cast
           equi-join semantics, not silently drop rows).  The full
           rationale sits on STRING_CODED_KEYS below.
  decimal  every DOUBLE column becomes DECIMAL(18,4) — catches code
           that assumes float semantics (both engines see the same
           4dp-quantized values, so comparisons stay exact).

Usage:
    python tools/dtype_probe.py [sf_dir] [query_name ...]
    python tools/dtype_probe.py /root/testdata/sf0.001 --mutation=strkeys

Mutated copies land in /tmp/dtype_probe/<sf>-<mutation>/ and are reused
when present (delete to regenerate).

Comparison note: Spark aggregates DECIMAL into wider DECIMAL while
DuckDB's avg() returns DOUBLE, so the decimal run canonicalizes
Decimal -> float and rounds at 6dp before the exact compare (the gate's
own normalize() rounds floats at 9dp, which is tighter than the two
engines' differing decimal-vs-binary division can guarantee).
"""

from __future__ import annotations

import decimal
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES  # noqa: E402
from tools.probe_common import run_catalog as _run_catalog  # noqa: E402

#: join keys string-coded on ONE side so every loader join crosses a
#: dtype boundary — in BOTH directions, because hashed_dim_join's two
#: code paths key off the FACT side's dtype:
#:   dim-string / fact-int  (r_regionkey, c_custkey, p_partkey): the
#:     integral fact key must take the plain join and implicitly cast;
#:   fact-string / dim-int  (l_suppkey, c_nationkey): the string fact
#:     key must NOT take the xxhash64 path against an integral dim —
#:     exactly the ADVICE-r10#1 silent-row-loss hole.
STRING_CODED_KEYS = {
    "region": {"r_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "part": {"p_partkey"},
    "lineitem": {"l_suppkey"},
}

MUTATIONS = ("int32", "strkeys", "decimal")


def mutate_tables(src_dir: str, dst_dir: str, mutation: str) -> None:
    """Write a dtype-mutated copy of every gate table (deterministic:
    pure casts, no randomness)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        arrays, fields = [], []
        for i, name in enumerate(tbl.column_names):
            field = tbl.schema.field(i)
            col = tbl.column(i).combine_chunks()
            new = col
            if mutation == "int32" and pa.types.is_integer(field.type) \
                    and field.type.bit_width > 32:
                mn = pc.min(col).as_py()
                mx = pc.max(col).as_py()
                if mn is not None and -2**31 <= mn and mx < 2**31:
                    new = pc.cast(col, pa.int32())
            elif mutation == "strkeys" \
                    and name in STRING_CODED_KEYS.get(t, ()):
                new = pc.cast(col, pa.string())
            elif mutation == "decimal" \
                    and pa.types.is_floating(field.type):
                new = pc.cast(col, pa.decimal128(18, 4))
            arrays.append(new)
            fields.append(pa.field(name, new.type, nullable=True))
        out = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        pq.write_table(out, os.path.join(dst_dir, f"{t}.parquet"))


def canon(rows, mutation: str):
    """Decimal -> float so Spark's widened-DECIMAL aggregates compare
    against DuckDB's double aggregates; under the decimal mutation also
    coarsen float rounding to 6dp (see module docstring)."""
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if mutation == "decimal" and isinstance(v, float):
                v = round(v + 0.0, 6)
            vals.append(v)
        out.append(tuple(vals))
    return out


def run_catalog(spark, con, qs, oracles, dst_dir: str, mutation: str,
                only: set) -> list:
    failures, n_run = _run_catalog(
        spark, con, qs, oracles, dst_dir, only,
        label=f"{mutation}/", canon=lambda rows: canon(rows, mutation))
    print(f"\n[{mutation}] {n_run - len(failures)}/{n_run} passing")
    return failures


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from niamoto_spark.session import get_spark

    from tools.probe_common import parse_args
    args, vals = parse_args(
        sys.argv[1:], {"mutation": (str, ",".join(MUTATIONS))},
        "usage: python tools/dtype_probe.py [sf_dir] [query_name ...] "
        f"[--mutation=m1,m2]  (mutations: {','.join(MUTATIONS)})")
    mutations = [m for m in vals["mutation"].split(",") if m]
    bad = [m for m in mutations if m not in MUTATIONS]
    if bad:
        print(f"unknown mutation(s): {' '.join(bad)}", file=sys.stderr)
        return 2
    src_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    spark = get_spark("dtype_probe")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    all_failures = {}
    for mutation in mutations:
        tag = f"{os.path.basename(src_dir.rstrip('/'))}-{mutation}"
        dst_dir = os.path.join("/tmp/dtype_probe", tag)
        marker = os.path.join(dst_dir, ".complete")
        if not os.path.exists(marker):
            shutil.rmtree(dst_dir, ignore_errors=True)
            print(f"mutating: {src_dir} -> {dst_dir} ({mutation})")
            mutate_tables(src_dir, dst_dir, mutation)
            open(marker, "w").close()
        else:
            print(f"reusing mutated tables at {dst_dir}")
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{dst_dir}/{t}.parquet'")
        fails = run_catalog(spark, con, qs, oracles, dst_dir, mutation,
                            only)
        if fails:
            all_failures[mutation] = fails
        con.close()

    if all_failures:
        for m, fails in all_failures.items():
            print(f"failing[{m}]:", " ".join(fails))
        return 1
    print("\nall mutations green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
