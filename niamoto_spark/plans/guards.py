"""Restricted SQL / expression surfaces.

The reference exposes three constrained languages (SURVEY §2.4):
1. database_aggregator's SELECT-only SQL with a forbidden-keyword guard
   (reference: transformers/aggregation/database_aggregator.py:243-257,
   358-373);
2. its AST-whitelisted "computed fields" safe-eval (:26-108);
3. multi_column_extractor's arithmetic formulas (:169).

This module ports those guards for the Spark engine: ``guard_select_only``
protects ``spark.sql`` escape hatches, ``safe_eval`` evaluates computed
fields driver-side over collected scalars, ``validate_formula`` gates
strings before they reach ``F.expr``.
"""

from __future__ import annotations

import ast
import math
import re

_FORBIDDEN = (
    # same spirit as database_aggregator.py:243-257
    "drop", "delete", "insert", "update", "alter", "create", "truncate",
    "grant", "revoke", "attach", "detach", "pragma", "vacuum", "merge",
)
_COMMENT_RE = re.compile(r"(--|/\*|\*/|;)")


class UnsafeQueryError(ValueError):
    pass


def guard_select_only(sql: str) -> str:
    """Validate that a query is a single SELECT/WITH statement with no DDL/
    DML keywords or comment tricks; returns the query unchanged."""
    stripped = sql.strip()
    if _COMMENT_RE.search(stripped):
        raise UnsafeQueryError("comments/semicolons not allowed")
    head = stripped.split(None, 1)[0].lower() if stripped else ""
    if head not in ("select", "with"):
        raise UnsafeQueryError("only SELECT/WITH queries allowed")
    tokens = re.findall(r"[a-zA-Z_]+", stripped.lower())
    bad = sorted(set(tokens) & set(_FORBIDDEN))
    if bad:
        raise UnsafeQueryError(f"forbidden keywords: {bad}")
    return sql


# --- safe eval (computed fields) -------------------------------------------

_ALLOWED_FUNCS = {
    # whitelist mirrors database_aggregator.py:26-39
    "abs": abs, "round": round, "min": min, "max": max, "sum": sum,
    "len": len, "int": int, "float": float, "pow": pow,
    "sqrt": math.sqrt, "ceil": math.ceil, "floor": math.floor,
}
_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.BoolOp, ast.Compare,
    ast.IfExp, ast.Call, ast.Name, ast.Load, ast.Constant,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.USub, ast.UAdd, ast.Not, ast.And, ast.Or,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.List, ast.Tuple,
)


def safe_eval(expression: str, variables: dict[str, object]) -> object:
    """AST-whitelisted arithmetic/boolean expression evaluator (reference
    database_aggregator.py:42-108): arithmetic, comparisons, ifexp, and the
    whitelisted function set only; names resolve from ``variables``."""
    tree = ast.parse(expression, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise UnsafeQueryError(
                f"disallowed syntax in computed field: {type(node).__name__}")
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _ALLOWED_FUNCS:
                raise UnsafeQueryError("only whitelisted functions allowed")
    env = {**_ALLOWED_FUNCS, **variables}
    return eval(compile(tree, "<computed_field>", "eval"), {"__builtins__": {}}, env)


# --- formula validation (multi_column derived columns) ----------------------

_FORMULA_TOKEN = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+(?:\.\d+)?|[()+\-*/\s]")

_FRACTIONAL_LIT = re.compile(r"(?<![\w.])(\d+\.\d+)(?![\w.dD])")


def pin_double_literals(formula: str) -> str:
    """Suffix fractional literals with ``D`` so Spark parses them as
    DOUBLE.  Spark SQL reads ``3.0`` as DECIMAL(2,1) and then evaluates
    ``x / 3.0`` in exact decimal arithmetic with engine-specific
    result scales; the reference's formula eval is numpy (binary
    double), and so is every SQL oracle — found by the formula fuzz
    (test_formula_fuzz.py), where ``5 / 3.0`` returned
    Decimal('1.6666667') on Spark and 1.6666666666666667 on DuckDB."""
    return _FRACTIONAL_LIT.sub(r"\1D", formula)


def validate_formula(formula: str, allowed_names: set[str]) -> str:
    """Arithmetic-only formula gate before F.expr (reference
    multi_column_extractor.py:169): identifiers must be declared columns;
    only + - * / and parens allowed."""
    pos = 0
    for m in _FORMULA_TOKEN.finditer(formula):
        if m.start() != pos:
            raise UnsafeQueryError(f"bad token in formula at {pos}: {formula!r}")
        tok = m.group(0)
        if re.match(r"[A-Za-z_]", tok) and tok not in allowed_names:
            raise UnsafeQueryError(f"unknown column {tok!r} in formula")
        pos = m.end()
    if pos != len(formula):
        raise UnsafeQueryError(f"bad token in formula at {pos}: {formula!r}")
    return formula
