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
