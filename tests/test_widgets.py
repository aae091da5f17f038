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


def test_sixteen_widgets_registered():
    from niamoto_spark.registry import PluginType, list_plugins, load_all

    load_all()
    widgets = list_plugins(PluginType.WIDGET)["widget"]
    assert len(widgets) >= 16
    assert {"bar_plot", "line_plot", "scatter_plot", "donut_chart",
            "radial_gauge", "sunburst_chart", "stacked_area_plot",
            "diverging_bar_plot", "concentric_rings", "interactive_map",
            "table_view", "summary_stats", "info_grid", "raw_data_widget",
            "hierarchical_nav_widget", "enrichment_panel"} <= set(widgets)


def test_sunburst_hierarchy_rows(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"family": ["A", "A", "B"], "genus": ["g1", "g2", "g3"],
         "n": [3, 2, 4]}))
    from niamoto_spark.widgets import sunburst_data

    rows = {r["id"]: r for r in sunburst_data(df, ["family", "genus"], "n").collect()}
    assert rows["A"]["value"] == 5 and rows["A"]["parent"] == ""
    assert rows["A/g1"]["parent"] == "A" and rows["A/g1"]["value"] == 3


def test_interactive_map_points(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"geometry_wkt": ["POINT (166.5 -22.1)", "garbage"],
         "point_count": [4, 1]}))
    from niamoto_spark.widgets import interactive_map_data

    rows = interactive_map_data(df).collect()
    assert len(rows) == 1 and rows[0]["lon"] == 166.5


def test_info_grid(spark):
    df = spark.createDataFrame(pd.DataFrame({"name": ["Plot 1"], "elev": [200]}))
    from niamoto_spark.widgets import info_grid_data

    got = {r["label"]: r["value"] for r in
           info_grid_data(df, {"Name": "name", "Elevation": "elev"}).collect()}
    assert got == {"Name": "Plot 1", "Elevation": "200"}
