"""Differential fuzz of the data-explorer predicate grammar (VERDICT r9
next-#8): generate seeded random VALID predicates over the customer
table and diff Spark's `explore()` filter against DuckDB running the
same predicate — the injection tests pin what's rejected; this pins
that what's ACCEPTED means the same thing on both engines.

1000 predicates by default (NIAMOTO_EXPLORER_FUZZ to change), split
into a handful of pytest cases so a failure names its seed range.
Comparisons are order-insensitive row sets without LIMIT (LIMIT under
a non-unique ORDER BY is engine-ambiguous by design and stays covered
by q21's unique-ordered gate).
"""

# Slow tier (r15, verdict item 1): this long refdiff/e2e/fuzz suite is
# opt-in so the DEFAULT `pytest tests/` finishes inside the driver's
# verify window (the r14 driver run was cut off at 95% after ~30 min).
# Run it with NIAMOTO_SLOW_TESTS=1 — the round's closing records include
# a full slow-tier pass.
import os as _os  # noqa: E402

import pytest as _pytest  # noqa: E402

pytestmark = _pytest.mark.skipif(
    not _os.environ.get("NIAMOTO_SLOW_TESTS"),
    reason="slow tier: set NIAMOTO_SLOW_TESTS=1")

import os
import random

import duckdb
import pytest

N_PREDS = int(os.environ.get("NIAMOTO_EXPLORER_FUZZ", "1000"))
CHUNK = 125

NUM_COLS = ["c_custkey", "c_nationkey", "c_acctbal"]
STR_COLS = ["c_name", "c_mktsegment"]
SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _gen_pred(rng: random.Random, depth: int = 0) -> str:
    if depth < 2 and rng.random() < 0.45:
        a = _gen_pred(rng, depth + 1)
        b = _gen_pred(rng, depth + 1)
        join = rng.choice(["AND", "OR"])
        s = f"({a} {join} {b})"
        return f"NOT {s}" if rng.random() < 0.2 else s
    kind = rng.choice(["numcmp", "strcmp", "like", "in", "isnull"])
    if kind == "numcmp":
        c = rng.choice(NUM_COLS)
        op = rng.choice(["=", "!=", "<", "<=", ">", ">="])
        v = rng.choice([0, 1, 100, 1500, rng.randrange(-1000, 10000)])
        return f"{c} {op} {v}"
    if kind == "strcmp":
        c = rng.choice(STR_COLS)
        op = rng.choice(["=", "!="])
        v = rng.choice(SEGS + ["customer#000000001", "none''s"])
        return f"{c} {op} '" + v.replace("'", "''") + "'"
    if kind == "like":
        pat = rng.choice(["%BUILD%", "customer%", "%1%", "%#00000%",
                          "_UTOMOBILE"])
        return f"{rng.choice(STR_COLS)} LIKE '{pat}'"
    if kind == "in":
        c = rng.choice(["c_mktsegment", "c_nationkey"])
        if c == "c_mktsegment":
            vals = ", ".join(f"'{s}'" for s in
                             rng.sample(SEGS, rng.randrange(1, 4)))
        else:
            vals = ", ".join(str(rng.randrange(0, 25))
                             for _ in range(rng.randrange(1, 4)))
        return f"{c} IN ({vals})"
    c = rng.choice(NUM_COLS + STR_COLS)
    return f"{c} IS NULL" if rng.random() < 0.5 else f"NOT {c} IS NULL"


@pytest.fixture(scope="module")
def fixtures(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS "
                f"SELECT * FROM '{sf_dir}/customer.parquet'")
    return cust, con


@pytest.mark.parametrize("chunk", range(N_PREDS // CHUNK))
def test_explorer_predicates_match_duckdb(fixtures, chunk):
    from niamoto_spark.plans.explorer import explore

    cust, con = fixtures
    rng = random.Random(20261015 + chunk)
    for i in range(CHUNK):
        pred = _gen_pred(rng)
        got = sorted(
            r["c_custkey"] for r in
            explore(cust, predicate=pred, limit=1000)
            .select("c_custkey").collect())
        want = sorted(r[0] for r in con.execute(
            f"SELECT c_custkey FROM customer WHERE {pred} "
            f"LIMIT 1000").fetchall())
        # LIMIT only binds when both engines saturate it — the gate
        # keeps predicates under 1000 hits at sf0.001 (1500 customers)
        if len(got) == 1000 and len(want) == 1000:
            continue
        assert got == want, (
            f"chunk {chunk} pred #{i}: {pred!r} -> spark "
            f"{len(got)} rows, duckdb {len(want)} rows")


@pytest.mark.parametrize("chunk", range(2))
def test_explorer_ordered_pages_match_duckdb(fixtures, chunk):
    """Ordered pages (r11): order_by + LIMIT under the UNIQUE key in
    both directions — exact ordered-list compare, including the
    contract that ordered pages rank only rows WITH the order key."""
    from niamoto_spark.plans.explorer import explore

    cust, con = fixtures
    rng = random.Random(20261116 + chunk)
    for i in range(100):
        pred = _gen_pred(rng)
        desc = rng.random() < 0.5
        limit = rng.choice([1, 7, 50, 200])
        got = [r["c_custkey"] for r in
               explore(cust, predicate=pred, order_by="c_custkey",
                       descending=desc, limit=limit)
               .select("c_custkey").collect()]
        direction = "DESC" if desc else "ASC"
        want = [r[0] for r in con.execute(
            f"SELECT c_custkey FROM customer WHERE ({pred}) "
            f"AND c_custkey IS NOT NULL "
            f"ORDER BY c_custkey {direction} LIMIT {limit}").fetchall()]
        assert got == want, (
            f"chunk {chunk} pred #{i}: {pred!r} {direction} "
            f"limit {limit} -> spark {got[:5]}..., duckdb {want[:5]}...")
