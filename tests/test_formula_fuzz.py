"""Differential fuzz for the three restricted formula grammars
(VERDICT r10 next-#4 — same recipe as test_explorer_fuzz):

1. multi_column derived formulas (plans/guards.py:validate_formula ->
   F.expr): arithmetic over declared columns;
2. custom_calculator custom_formula (operators/ecological.py): the
   arithmetic grammar plus the whitelisted math functions;
3. database_aggregator computed fields (plans/guards.py:safe_eval):
   driver-side Python AST whitelist over collected scalars.

Each fuzz generates seeded random expressions from ONE mini-AST and
renders them per engine (Spark SQL / DuckDB SQL / Python), so both
sides evaluate the same semantics on the same values; any divergence
is an engine-semantics bug in the grammar surface.

Deliberately OUT of the generated grammar (documented cross-engine
gaps, each pinned elsewhere):
- ``round(double, n)``: Spark rounds the shortest-decimal repr while
  DuckDB rounds the binary value — exact .xx5 flips are REAL and are
  pinned per-lane with the integer-cent recipe (q13/q214/q273);
- Python's single-arg ``round`` (banker's) and ``int()`` (truncation
  toward zero) vs SQL CAST (rounding);
- ``%``/``//`` on negative operands (Python sign-of-divisor vs SQL
  sign-of-dividend) — generated operands are abs()+1 wrapped.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from niamoto_spark.plans.guards import safe_eval, validate_formula

SEED = 20261115
N_PER_BATCH = 250
N_BATCHES = 4

COLS = ["c_custkey", "c_nationkey", "c_acctbal"]
#: nonzero, sign-safe divisors so neither engine hits x/0
DIVISORS = [2.0, 4.0, 0.5, 3.0, 1.25, 10.0]
LITS = [1, 2, 3, 5, 7, 0.5, 1.5, 2.5]


# --- mini-AST ---------------------------------------------------------------

def gen_arith(rng, depth: int, funcs: bool):
    """Random expression tree: ("col", c) | ("lit", v) |
    (op, a, b) | ("call", fn, [args])."""
    if depth == 0 or rng.random() < 0.3:
        if rng.random() < 0.6:
            return ("col", COLS[rng.integers(len(COLS))])
        return ("lit", LITS[rng.integers(len(LITS))])
    r = rng.random()
    if funcs and r < 0.35:
        fn = ["log", "log10", "log2", "sqrt", "exp", "abs", "pow",
              "least", "greatest"][rng.integers(9)]
        a = gen_arith(rng, depth - 1, funcs)
        if fn in ("log", "log10", "log2", "sqrt"):
            # domain-safe: strictly positive argument
            return ("call", fn, [("call", "abs", [a]), ("lit", 1)])
        if fn == "exp":
            # overflow-safe: bounded argument
            return ("call", "exp",
                    [("call", "least", [("call", "abs", [a]),
                                        ("lit", 5)])])
        if fn == "pow":
            return ("call", "pow", [a, ("lit", int(rng.integers(1, 4)))])
        if fn in ("least", "greatest"):
            return ("call", fn, [a, gen_arith(rng, depth - 1, funcs)])
        return ("call", "abs", [a])
    op = ["+", "-", "*", "/"][rng.integers(4)]
    a = gen_arith(rng, depth - 1, funcs)
    if op == "/":
        return ("/", a, ("lit", DIVISORS[rng.integers(len(DIVISORS))]))
    return (op, a, gen_arith(rng, depth - 1, funcs))


def render(node, dialect: str) -> str:
    kind = node[0]
    if kind == "col":
        return node[1]
    if kind == "lit":
        return repr(node[1])
    if kind == "call":
        fn, args = node[1], node[2]
        rendered = [render(a, dialect) for a in args]
        if fn in ("log", "log10", "log2", "sqrt") and len(rendered) == 2:
            # the domain-safe form: fn(abs(x) + 1)
            inner = f"({rendered[0]} + {rendered[1]})"
            rendered = [inner]
        name = fn
        if dialect == "duckdb" and fn == "log":
            name = "ln"  # DuckDB log() is log10; Spark log() is ln
        return f"{name}({', '.join(rendered)})"
    op, a, b = node
    return f"({render(a, dialect)} {op} {render(b, dialect)})"


def _close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    fa, fb = float(a), float(b)
    if math.isnan(fa) or math.isnan(fb):
        return math.isnan(fa) and math.isnan(fb)
    return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)


def _diff_batch(spark, sf_dir, exprs_spark, exprs_duck, via):
    """Evaluate both engines' expression lists over customer, aligned
    on c_custkey, and return the mismatches."""
    import pyspark.sql.functions as F

    df = (spark.read.parquet(f"{sf_dir}/customer.parquet")
          .where(F.col("c_custkey").isNotNull()))
    if via == "custom_formula":
        from niamoto_spark.operators.ecological import custom_formula

        out = df
        for i, s in enumerate(exprs_spark):
            out = custom_formula(out, s, out=f"e{i}")
        out = out.select("c_custkey",
                         *[f"e{i}" for i in range(len(exprs_spark))])
    else:
        out = df.select("c_custkey",
                        *[F.expr(s).alias(f"e{i}")
                          for i, s in enumerate(exprs_spark)])
    srows = out.orderBy("c_custkey").collect()

    con = duckdb.connect()
    sel = ", ".join(f"{e} AS e{i}" for i, e in enumerate(exprs_duck))
    orows = con.execute(
        f"SELECT c_custkey, {sel} "
        f"FROM '{sf_dir}/customer.parquet' "
        "WHERE c_custkey IS NOT NULL ORDER BY c_custkey").fetchall()

    assert len(srows) == len(orows)
    bad = []
    for sr, orow in zip(srows, orows):
        for i in range(len(exprs_spark)):
            if not _close(sr[i + 1], orow[i + 1]):
                bad.append((exprs_spark[i], sr[0], sr[i + 1],
                            orow[i + 1]))
                break
    return bad


def test_multi_column_derived_formula_fuzz(spark, sf_dir):
    """Grammar 1: 1000 arithmetic formulas through the exact gate the
    operator uses (validate_formula) then F.expr, vs DuckDB."""
    from niamoto_spark.plans.guards import pin_double_literals

    rng = np.random.default_rng(SEED)
    for _ in range(N_BATCHES):
        exprs = [render(gen_arith(rng, 3, funcs=False), "spark")
                 for _ in range(N_PER_BATCH)]
        for e in exprs:
            validate_formula(e, set(COLS))
        # the operator compiles validated formulas through
        # pin_double_literals before F.expr — mirror that exact path
        spark_exprs = [pin_double_literals(e) for e in exprs]
        bad = _diff_batch(spark, sf_dir, spark_exprs, exprs, via="expr")
        assert not bad, bad[:3]


def test_custom_formula_fuzz(spark, sf_dir):
    """Grammar 2: 200 formulas with the math-function whitelist through
    the REAL custom_formula operator (guard + withColumn), vs DuckDB
    with the log->ln dialect translation."""
    rng = np.random.default_rng(SEED + 1)
    for _ in range(4):
        nodes = [gen_arith(rng, 3, funcs=True) for _ in range(50)]
        exprs_s = [render(n, "spark") for n in nodes]
        exprs_d = [render(n, "duckdb") for n in nodes]
        bad = _diff_batch(spark, sf_dir, exprs_s, exprs_d,
                          via="custom_formula")
        assert not bad, bad[:3]


# --- grammar 3: safe_eval computed fields -----------------------------------

SCALARS = {"n": 42, "total": 1234, "avg_v": 45.67, "frac": 0.25,
           "neg": -3.5}


def gen_scalar(rng, depth: int):
    if depth == 0 or rng.random() < 0.3:
        if rng.random() < 0.6:
            keys = sorted(SCALARS)
            return ("col", keys[rng.integers(len(keys))])
        return ("lit", LITS[rng.integers(len(LITS))])
    r = rng.random()
    if r < 0.15:
        # comparison-fed ternary: value if cond else value
        return ("ifexp", gen_cmp(rng, depth - 1),
                gen_scalar(rng, depth - 1), gen_scalar(rng, depth - 1))
    if r < 0.3:
        fn = ["abs", "sqrt", "min", "max", "pow", "ceil",
              "floor"][rng.integers(7)]
        a = gen_scalar(rng, depth - 1)
        if fn == "sqrt":
            return ("call", "sqrt", [("call", "abs", [a]), ("lit", 1)])
        if fn == "pow":
            return ("call", "pow", [a, ("lit", int(rng.integers(1, 3)))])
        if fn in ("min", "max"):
            return ("call", fn, [a, gen_scalar(rng, depth - 1)])
        return ("call", fn, [a])
    op = ["+", "-", "*", "/"][rng.integers(4)]
    a = gen_scalar(rng, depth - 1)
    if op == "/":
        return ("/", a, ("lit", DIVISORS[rng.integers(len(DIVISORS))]))
    return (op, a, gen_scalar(rng, depth - 1))


def gen_cmp(rng, depth: int):
    op = ["<", "<=", ">", ">=", "==", "!="][rng.integers(6)]
    return ("cmp", op, gen_scalar(rng, depth), gen_scalar(rng, depth))


def render_scalar(node, dialect: str) -> str:
    kind = node[0]
    if kind == "col":
        return node[1]
    if kind == "lit":
        return repr(node[1])
    if kind == "cmp":
        _, op, a, b = node
        sop = "=" if (op == "==" and dialect == "duckdb") else op
        return (f"({render_scalar(a, dialect)} {sop} "
                f"{render_scalar(b, dialect)})")
    if kind == "ifexp":
        _, c, a, b = node
        if dialect == "python":
            return (f"({render_scalar(a, dialect)} if "
                    f"{render_scalar(c, dialect)} else "
                    f"{render_scalar(b, dialect)})")
        return (f"(CASE WHEN {render_scalar(c, dialect)} "
                f"THEN {render_scalar(a, dialect)} "
                f"ELSE {render_scalar(b, dialect)} END)")
    if kind == "call":
        fn, args = node[1], node[2]
        rendered = [render_scalar(a, dialect) for a in args]
        if fn == "sqrt" and len(rendered) == 2:
            inner = f"({rendered[0]} + {rendered[1]})"
            rendered = [inner]
        name = fn
        if dialect == "duckdb":
            name = {"min": "least", "max": "greatest"}.get(fn, fn)
        return f"{name}({', '.join(rendered)})"
    op, a, b = node
    return (f"({render_scalar(a, dialect)} {op} "
            f"{render_scalar(b, dialect)})")


def test_computed_fields_safe_eval_fuzz():
    """Grammar 3: 1000 scalar expressions through the REAL safe_eval
    (AST whitelist + eval) vs DuckDB evaluating the same expression
    over the same scalar bindings."""
    rng = np.random.default_rng(SEED + 2)
    con = duckdb.connect()
    binds = ", ".join(f"{v!r} AS {k}" for k, v in sorted(SCALARS.items()))
    for _ in range(4):
        nodes = [gen_scalar(rng, 3) for _ in range(250)]
        py = [render_scalar(n, "python") for n in nodes]
        dk = [render_scalar(n, "duckdb") for n in nodes]
        got = [safe_eval(e, dict(SCALARS)) for e in py]
        sel = ", ".join(f"{e} AS e{i}" for i, e in enumerate(dk))
        want = con.execute(
            f"WITH s AS (SELECT {binds}) SELECT {sel} FROM s").fetchone()
        bad = [(py[i], got[i], want[i]) for i in range(len(nodes))
               if not _close(got[i], want[i])]
        assert not bad, bad[:3]


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
