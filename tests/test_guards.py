"""Pure-Python tests: restricted SQL/expression surfaces (no Spark)."""

import pytest

from niamoto_spark.plans.explorer import validate_predicate
from niamoto_spark.plans.guards import (UnsafeQueryError, guard_select_only,
                                        safe_eval, validate_formula)


def test_select_only_accepts_select_and_with():
    guard_select_only("SELECT * FROM t")
    guard_select_only("WITH x AS (SELECT 1 AS a) SELECT * FROM x")


@pytest.mark.parametrize("bad", [
    "DROP TABLE t",
    "SELECT * FROM t; DROP TABLE t",
    "SELECT * FROM t -- comment",
    "INSERT INTO t VALUES (1)",
    "SELECT * FROM t WHERE x = 1 /* hack */",
    "update t set x=1",
])
def test_select_only_rejects(bad):
    with pytest.raises(UnsafeQueryError):
        guard_select_only(bad)


def test_safe_eval_arithmetic():
    assert safe_eval("a + b * 2", {"a": 1, "b": 3}) == 7
    assert safe_eval("round(sqrt(x), 2)", {"x": 2.0}) == 1.41
    assert safe_eval("max(a, b) if a > 0 else min(a, b)", {"a": 1, "b": 5}) == 5


@pytest.mark.parametrize("bad", [
    "__import__('os')",
    "().__class__",
    "open('/etc/passwd')",
    "lambda: 1",
    "[x for x in range(3)]",
])
def test_safe_eval_rejects(bad):
    with pytest.raises(UnsafeQueryError):
        safe_eval(bad, {})


def test_formula_validation():
    validate_formula("total_stems - living_stems",
                     {"total_stems", "living_stems"})
    with pytest.raises(UnsafeQueryError):
        validate_formula("evil_col + 1", {"a"})
    with pytest.raises(UnsafeQueryError):
        validate_formula("a; drop", {"a"})


def test_explorer_predicate_grammar():
    cols = {"c_acctbal", "c_mktsegment"}
    validate_predicate("c_acctbal > 100 AND c_mktsegment = 'X'", cols)
    validate_predicate("(c_acctbal >= 1 OR c_acctbal < -5) AND c_mktsegment IS NOT NULL", cols)
    with pytest.raises(UnsafeQueryError):
        validate_predicate("unknown_col = 1", cols)
    with pytest.raises(UnsafeQueryError):
        validate_predicate("c_acctbal > 1)", cols)
    with pytest.raises(UnsafeQueryError):
        validate_predicate("c_acctbal > 1; DROP TABLE x", cols)
