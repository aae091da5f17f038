"""Property-based tests (hypothesis) — beyond the reference's own test
strategy (SURVEY §5 notes it has none).  Kept to a handful of cheap,
high-leverage invariants; Spark round trips are bounded with small sizes
and few examples to keep the suite fast."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from niamoto_spark.plans.guards import UnsafeQueryError, safe_eval

settings.register_profile("ci", max_examples=15, deadline=None)
settings.load_profile("ci")


values = st.lists(st.floats(min_value=0.0, max_value=1000.0,
                            allow_nan=False, width=32),
                  min_size=1, max_size=60)


@given(values)
def test_bin_index_matches_np_histogram(spark, xs):
    from pyspark.sql import functions as F

    from niamoto_spark.functions import bin_index

    edges = [0, 100, 250, 500, 1000]
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    got = (df.select(bin_index(F.col("x"), edges).alias("b"))
             .groupBy("b").count().collect())
    counts = {r["b"]: r["count"] for r in got if r["b"] is not None}
    np_counts, _ = np.histogram(xs, bins=edges)
    for i, c in enumerate(np_counts):
        assert counts.get(i, 0) == c


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=20))
def test_shannon_matches_numpy(spark, counts):
    from niamoto_spark.operators.ecological import shannon_pielou

    df = spark.createDataFrame(pd.DataFrame({"g": ["x"] * len(counts),
                                             "count": counts}))
    r = shannon_pielou(df, ["g"]).collect()[0]
    nz = np.array([c for c in counts if c > 0], dtype=float)
    if len(nz) == 0:
        assert r["shannon"] == 0.0
    else:
        p = nz / nz.sum()
        assert r["shannon"] == pytest.approx(round(float(-(p * np.log2(p)).sum()), 4),
                                             abs=1e-6)


@given(st.text(max_size=80))
def test_token_count_never_negative_and_ws_invariant(spark, text):
    from pyspark.sql import functions as F

    from niamoto_spark.functions import token_count

    df = spark.createDataFrame(pd.DataFrame({"t": [text, f"  {text}  "]}))
    a, b = [r["n"] for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert a >= 0 and a == b  # padding never changes the token count


@given(st.text(alphabet="abc+-*/() ", max_size=30))
def test_safe_eval_never_escapes(expr):
    """Whatever the input, safe_eval either computes or raises UnsafeQueryError /
    a plain math error — never touches builtins."""
    try:
        safe_eval(expr, {"a": 1.0, "b": 2.0, "c": 3.0})
    except (UnsafeQueryError, SyntaxError, ZeroDivisionError, TypeError,
            KeyError, ValueError, OverflowError, NameError, MemoryError):
        pass  # any *contained* failure is fine; escaping the sandbox is not
