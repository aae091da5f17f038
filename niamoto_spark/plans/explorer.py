"""Data-explorer restricted query surface (reference:
src/niamoto/gui/api/routers/data_explorer.py:18,62-322).

The reference compiles a restricted boolean predicate grammar
(=, !=, <, <=, >, >=, LIKE, IN, IS NULL, NOT, AND, OR, parens) to
parameterized SQL with a safe ORDER BY and LIMIT <= 1000.  Here the same
grammar validates a predicate string before it reaches ``DataFrame.filter``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from niamoto_spark.plans.guards import UnsafeQueryError

MAX_QUERY_LIMIT = 1000  # reference data_explorer.py:18
DEFAULT_LIMIT = 100

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<op><=|>=|!=|=|<|>) |
        (?P<kw>(?i:AND|OR|NOT|LIKE|IN|IS|NULL))\b |
        (?P<num>-?\d+(?:\.\d+)?) |
        (?P<str>'(?:[^']|'')*') |
        (?P<ident>[A-Za-z_][A-Za-z0-9_]*) |
        (?P<comma>,)
    )""",
    re.VERBOSE,
)


def validate_predicate(pred: str, columns: set[str]) -> str:
    """Tokenize + validate a predicate against the restricted grammar and
    the table's columns; returns the predicate for DataFrame.filter."""
    pos = 0
    depth = 0
    while pos < len(pred):
        m = _TOKEN.match(pred, pos)
        if not m or m.end() == pos:
            raise UnsafeQueryError(f"bad token at {pos} in predicate {pred!r}")
        if m.group("lparen"):
            depth += 1
        elif m.group("rparen"):
            depth -= 1
            if depth < 0:
                raise UnsafeQueryError("unbalanced parens")
        elif m.group("ident"):
            ident = m.group("ident")
            if ident.upper() not in ("TRUE", "FALSE") and ident not in columns:
                raise UnsafeQueryError(f"unknown column {ident!r}")
        pos = m.end()
    if depth != 0:
        raise UnsafeQueryError("unbalanced parens")
    return pred


def explore(df: DataFrame, predicate: str | None = None,
            order_by: str | None = None, descending: bool = False,
            limit: int = DEFAULT_LIMIT) -> DataFrame:
    """The explorer endpoint semantics: filter + safe ORDER BY + capped
    LIMIT (reference :293-363).

    API contract — NULL order keys (ADVICE r11, user-visible
    divergence from the reference): ordered pages contain only rows
    WHERE ``order_by`` IS NOT NULL.  The reference (DuckDB ORDER BY)
    places NULL-key rows at the end of ascending pages, but any
    NULLS-LAST emulation is nondeterministic the moment the LIMIT
    boundary cuts into the tied NULL block — different engines (and
    different partitionings of the SAME engine) return different row
    sets for the identical request.  Clients that need the NULL-key
    rows should page them explicitly with ``predicate="col IS NULL"``
    and no order key."""
    cols = set(df.columns)
    out = df
    if predicate:
        out = out.filter(validate_predicate(predicate, cols))
    if order_by:
        if order_by not in cols:
            raise UnsafeQueryError(f"unknown order column {order_by!r}")
        # Ordered pages contain only rows WITH the order key: NULL keys
        # have no defined rank (engines disagree on NULL placement —
        # Spark asc puts them first, DuckDB/Postgres last) and several
        # NULL-key rows tie arbitrarily inside the LIMIT boundary, so a
        # page over them is nondeterministic on ANY engine.  Found by
        # the sf0.1 NULL probe: NULL c_custkey rows entered the top-50
        # on Spark only.
        out = out.where(df[order_by].isNotNull())
        out = out.orderBy(df[order_by].desc() if descending else df[order_by].asc())
    return out.limit(min(int(limit), MAX_QUERY_LIMIT))
