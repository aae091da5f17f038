"""Misra–Gries heavy hitters (operators/sketches.py)."""

from pyspark.sql import functions as F

from niamoto_spark.operators.sketches import (heavy_hitters,
                                              heavy_hitters_exact)


def _skewed(spark):
    # 'hot' 400x, 'warm' 150x, 40 distinct cold items 5x each
    rows = ([("hot",)] * 400 + [("warm",)] * 150 +
            [(f"cold{i}",) for i in range(40) for _ in range(5)])
    return spark.createDataFrame(rows, ["v"]).repartition(8)


def test_guarantee_frequent_items_always_present(spark):
    """n = 750; with k = 9 any item with freq > 75 must be present:
    hot (400) and warm (150)."""
    got = dict(heavy_hitters(_skewed(spark), "v", k=9))
    assert "hot" in got and "warm" in got


def test_counts_are_lower_bounds_within_guarantee(spark):
    df = _skewed(spark)
    n = df.count()
    k = 9
    got = dict(heavy_hitters(df, "v", k=k))
    exact = {r["item"]: r["freq"]
             for r in heavy_hitters_exact(df, "v", k=50).collect()}
    for item, c in got.items():
        assert c <= exact[item]
        assert exact[item] - c <= n / (k + 1)


def test_partition_layout_does_not_break_guarantee(spark):
    for parts in (1, 3, 16):
        df = _skewed(spark).repartition(parts)
        got = dict(heavy_hitters(df, "v", k=9))
        assert "hot" in got and "warm" in got


def test_exact_path_matches_groupby(spark):
    df = _skewed(spark)
    top = heavy_hitters_exact(df, "v", k=2).collect()
    assert [(r["item"], r["freq"]) for r in top] == \
        [("hot", 400), ("warm", 150)]


def test_nulls_ignored(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], ["v"])
    got = dict(heavy_hitters(df, "v", k=4))
    assert got == {"a": 2}


def test_exact_when_k_exceeds_distinct_count(spark):
    """MG never decrements when counters never overflow, so k > distinct
    makes the sketch exact — the q126 oracle contract."""
    df = _skewed(spark)
    got = dict(heavy_hitters(df, "v", k=64))
    exact = {r["item"]: r["freq"]
             for r in heavy_hitters_exact(df, "v", k=64).collect()}
    assert got == exact


def test_non_string_item_type(spark):
    """mapInArrow output schema follows the input column type."""
    rows = [(i % 3,) for i in range(90)] + [(7,)] * 10
    df = spark.createDataFrame(rows, ["v"]).repartition(4)
    got = dict(heavy_hitters(df, "v", k=8))
    assert got == {0: 30, 1: 30, 2: 30, 7: 10}


def test_plan_is_arrow_not_rdd(spark):
    """The sketch substrate must be Arrow-batched mapInArrow, never a
    row-at-a-time .rdd scan (VERDICT r6 #1)."""
    import inspect

    from niamoto_spark.operators import sketches

    src = inspect.getsource(sketches)
    assert ".rdd" not in src
    assert "mapInArrow" in src
