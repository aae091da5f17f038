"""Widget data-shapers (§2.5 light data ops)."""

import pandas as pd

from niamoto_spark import widgets as w


def test_bar_plot_sort_limit(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"family": ["A", "B", "C"], "n": [5, 9, 9]}))
    rows = w.bar_plot_data(df, "family", "n", limit=2).collect()
    assert [(r["x"], r["y"]) for r in rows] == [("B", 9), ("C", 9)]


def test_donut_chart_shares(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"label": ["um", "num"], "value": [30, 70]}))
    rows = {r["label"]: r["pct"] for r in
            w.donut_chart_data(df, "label", "value").collect()}
    assert rows == {"um": 30.0, "num": 70.0}


def test_summary_stats_long(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"g": ["x"], "min": [1.0], "mean": [2.0], "max": [3.0]}))
    rows = {r["stat"]: r["value"] for r in w.summary_stats_data(df).collect()}
    assert rows == {"min": 1.0, "mean": 2.0, "max": 3.0}


def test_hierarchical_nav(spark):
    df = spark.createDataFrame(
        [(1, None, "root", 1, 6), (2, 1, "child", 2, 3), (3, 1, "leaf", 4, 5)],
        "id bigint, parent_id bigint, rank_value string, lft int, rght int")
    rows = w.hierarchical_nav_data(df).collect()
    assert [r["label"] for r in rows] == ["root", "child", "leaf"]  # lft order
    assert rows[0]["has_children"] and not rows[2]["has_children"]
