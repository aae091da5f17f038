"""Imputation (operators/cleaning.py) + triangle counting
(operators/graph.py:triangle_count)."""

import pytest
from pyspark.sql import functions as F

from niamoto_spark.operators.cleaning import impute
from niamoto_spark.operators.graph import triangle_count


def test_impute_group_mean_and_flag(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None), ("b", 10.0)],
        ["g", "v"])
    out = impute(df, "v", strategy="mean", group_cols=["g"],
                 flag_col="was_null").collect()
    vals = sorted((r["g"], r["v"], r["was_null"]) for r in out)
    assert ("a", 2.0, True) in vals     # mean of 1, 3
    assert ("b", 10.0, True) in vals
    assert ("a", 1.0, False) in vals


def test_impute_all_null_group_stays_null(spark):
    df = spark.createDataFrame([("a", None), ("a", None), ("b", 5.0)],
                               "g string, v double")
    out = {(r["g"], r["v"]) for r in
           impute(df, "v", group_cols=["g"]).collect()}
    assert ("a", None) in out


def test_impute_global_median_and_constant(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,), (100.0,)],
                               "v double")
    med = [r["v"] for r in impute(df, "v", strategy="median").collect()]
    assert sorted(med) == [1.0, 3.0, 3.0, 100.0]
    const = impute(df, "v", strategy="constant", fill_value=-1.0)
    assert sorted(r["v"] for r in const.collect()) == [-1.0, 1.0, 3.0, 100.0]
    with pytest.raises(ValueError):
        impute(df, "v", strategy="constant")


def test_triangle_count_exact(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant edge 4-5
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = {r["node_id"]: r["n_triangles"]
           for r in triangle_count(pairs).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_undirected_input_and_dupes(spark):
    # same triangle given with mixed orientations and duplicates
    edges = [(1, 2), (2, 1), (3, 2), (1, 3), (1, 3)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = {r["node_id"]: r["n_triangles"]
           for r in triangle_count(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_triangle_count_no_triangles(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    assert triangle_count(pairs).count() == 0


def test_winsorize_clips_to_percentiles(spark):
    from niamoto_spark.operators.cleaning import winsorize

    df = spark.createDataFrame([(float(v),) for v in range(1, 101)],
                               "x double")
    out = winsorize(df, "x", lower=0.1, upper=0.9).collect()
    vals = sorted(r["x_wins"] for r in out)
    # p10 of 1..100 (linear interp) = 10.9, p90 = 90.1
    assert abs(vals[0] - 10.9) < 1e-9
    assert abs(vals[-1] - 90.1) < 1e-9
    # interior values untouched
    assert any(abs(v - 50.0) < 1e-9 for v in vals)


def test_winsorize_rejects_bad_bounds(spark):
    import pytest

    from niamoto_spark.operators.cleaning import winsorize

    with pytest.raises(ValueError, match="lower < upper"):
        winsorize(spark.range(3).select(F.col("id").cast("double")
                                        .alias("x")), "x",
                  lower=0.9, upper=0.1)


def test_robust_outliers_flags_only_extremes(spark):
    from niamoto_spark.operators.cleaning import robust_outliers

    rows = [("g", float(v)) for v in range(100)] + [("g", 10000.0)]
    df = spark.createDataFrame(rows, "k string, x double")
    out = {r["x"]: r["is_outlier"]
           for r in robust_outliers(df, "x", ["k"]).collect()}
    assert out[10000.0] is True
    assert sum(1 for v, f in out.items() if f) == 1


def test_robust_outliers_constant_group_flags_nothing(spark):
    from niamoto_spark.operators.cleaning import robust_outliers

    df = spark.createDataFrame([("a", 5.0)] * 10, "k string, x double")
    out = robust_outliers(df, "x", ["k"]).collect()
    assert all(r["is_outlier"] is False for r in out)
