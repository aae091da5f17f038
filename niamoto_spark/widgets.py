"""Widget data-shapers (SURVEY §2.5).

The reference's 16 widget plugins render JSON results to Plotly HTML and do
"light data ops" on the way (sort_values in bar_plot.py:858,874,
table_view.py:204).  Rendering is presentation; the data ops belong to the
engine.  Each shaper takes a widget frame (an operator's output) and returns
the render-ready DataFrame — sorted, limited, renamed — that a chart
front-end consumes directly.  Compatibility between operators and shapers is
scored by niamoto_spark.matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("bar_plot", PluginType.WIDGET)
def bar_plot_data(df: DataFrame, x: str, y: str, sort_by: str | None = None,
                  descending: bool = True, limit: int | None = None) -> DataFrame:
    """bar_plot's sort/limit pass (reference bar_plot.py:858,874)."""
    out = df.select(F.col(x).alias("x"), F.col(y).alias("y"))
    key = sort_by or y
    src = df.select(F.col(x).alias("x"), F.col(y).alias("y"),
                    F.col(key).alias("__s"))
    out = src.orderBy(F.col("__s").desc() if descending else F.col("__s").asc(),
                      F.col("x").asc()).drop("__s")
    return out.limit(limit) if limit else out


@register("donut_chart", PluginType.WIDGET)
def donut_chart_data(df: DataFrame, label: str, value: str) -> DataFrame:
    """Labels + values + share percentages."""
    total = df.agg(F.sum(F.col(value)).alias("t")).collect()[0]["t"] or 1
    return df.select(F.col(label).alias("label"),
                     F.col(value).alias("value"),
                     F.round(F.col(value) * 100.0 / F.lit(total), 2).alias("pct")) \
             .orderBy(F.col("value").desc(), F.col("label"))


@register("table_view", PluginType.WIDGET)
def table_view_data(df: DataFrame, sort_by: str | None = None,
                    descending: bool = False, limit: int = 100) -> DataFrame:
    """table_view's default sort + cap (reference table_view.py:204)."""
    out = df
    if sort_by:
        out = out.orderBy(F.col(sort_by).desc() if descending
                          else F.col(sort_by).asc())
    return out.limit(limit)


@register("summary_stats", PluginType.WIDGET)
def summary_stats_data(df: DataFrame) -> DataFrame:
    """statistical_summary frame -> long (stat, value) rows for a stat grid."""
    stats = [c for c in df.columns
             if c in ("min", "mean", "max", "median", "std", "count")]
    stack = ", ".join(f"'{c}', cast(`{c}` as double)" for c in stats)
    group_cols = [c for c in df.columns if c not in stats]
    return df.selectExpr(*group_cols,
                         f"stack({len(stats)}, {stack}) as (stat, value)")


@register("hierarchical_nav_widget", PluginType.WIDGET)
def hierarchical_nav_data(nodes: DataFrame, id_col: str = "id",
                          parent_col: str = "parent_id",
                          label_col: str = "rank_value") -> DataFrame:
    """Navigation tree rows: (id, parent_id, label, has_children) sorted by
    nested-set order when available."""
    kids = nodes.groupBy(F.col(parent_col).alias(id_col)) \
                .agg(F.count(F.lit(1)).alias("__n"))
    out = (nodes.join(kids, id_col, "left")
           .withColumn("has_children", F.coalesce(F.col("__n"), F.lit(0)) > 0)
           .drop("__n")
           .select(id_col, parent_col, F.col(label_col).alias("label"),
                   "has_children",
                   *(["lft"] if "lft" in nodes.columns else [])))
    return out.orderBy("lft") if "lft" in nodes.columns else out.orderBy(id_col)
