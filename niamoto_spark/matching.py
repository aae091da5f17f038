"""SmartMatcher — transformer output-structure vs widget compatibility
(reference: core/plugins/matching/matcher.py:104-336; structures declared
per transformer, e.g. binned_distribution.py:152-157).

In the Spark rebuild the "output structure" is the widget frame's declared
column set (the non-group columns each operator emits).  The matcher scores
a transformer structure against a widget's compatible structures:
exact match > superset > partial overlap, mirroring the reference's tiers.
"""

from __future__ import annotations

from dataclasses import dataclass

# transformer name -> output columns (the frames' non-group columns)
OUTPUT_STRUCTURES: dict[str, list[str]] = {
    "statistical_summary": ["min", "mean", "max", "median", "std", "count"],
    "binned_distribution": ["bin_index", "bin_label", "count", "pct"],
    "categorical_distribution": ["category", "count", "pct"],
    "binary_counter": ["true_count", "false_count", "true_label", "false_label"],
    "boolean_comparison": ["category", "true_count", "false_count"],
    "top_ranking": ["item", "value", "rank"],
    "time_series_analysis": ["month"],  # + one <field>_pct per field
    "multi_column_extractor": ["category", "value", "pct"],
    "direct_attribute": ["value"],
    "scatter_analysis": ["x", "y"],
    "geospatial_extractor": ["geometry_wkt", "point_count"],
    "class_object_series_extractor": ["class_name", "class_value"],
    "class_object_categories_extractor": ["class_name", "class_value"],
    "class_object_binary_aggregator": ["label", "share"],
    "class_object_field_aggregator": ["value"],
    "fragmentation_analysis": ["patch_count", "total_area", "meff",
                               "largest_patch_index", "patch_density"],
    "token_stats": ["n_docs", "total_tokens", "avg_tokens", "avg_chars"],
    "cosine_topk": ["query_id", "neighbor_id", "similarity", "rank"],
}

# widget name -> structures it can render (each a required-column list)
WIDGET_COMPATIBILITY: dict[str, list[list[str]]] = {
    "bar_plot": [["category", "count"], ["item", "value"],
                 ["bin_label", "count"], ["category", "value"]],
    "line_plot": [["month"], ["x", "y"], ["class_name", "class_value"]],
    "scatter_plot": [["x", "y"]],
    "donut_chart": [["category", "count"], ["label", "share"],
                    ["true_count", "false_count"]],
    "radial_gauge": [["value"]],
    "stacked_area_plot": [["month"], ["class_name", "class_value"]],
    "diverging_bar_plot": [["category", "true_count", "false_count"]],
    "sunburst_chart": [["item", "value", "rank"]],
    "interactive_map": [["geometry_wkt", "point_count"]],
    "table_view": [[]],                       # renders anything
    "summary_stats": [["min", "mean", "max", "median", "std", "count"]],
    "info_grid": [["value"], []],
    "raw_data_widget": [[]],
}


@dataclass
class Match:
    widget: str
    score: float
    kind: str  # exact | superset | partial


def score_structure(transformer_cols: list[str],
                    required: list[str]) -> tuple[float, str]:
    """Reference tiers (matcher.py:104-336): exact=1.0, superset=0.8,
    partial = 0.5 * overlap fraction, no overlap = 0."""
    t, r = set(transformer_cols), set(required)
    if not r:
        return 0.3, "partial"          # wildcard widgets accept anything
    if t == r:
        return 1.0, "exact"
    if r <= t:
        return 0.8, "superset"
    overlap = len(t & r) / len(r)
    return (0.5 * overlap, "partial") if overlap else (0.0, "partial")


def match_widgets(transformer: str,
                  min_score: float = 0.3) -> list[Match]:
    """Rank widgets able to render a transformer's output."""
    cols = OUTPUT_STRUCTURES.get(transformer)
    if cols is None:
        raise KeyError(f"no declared output structure for {transformer!r}")
    out = []
    for widget, structures in WIDGET_COMPATIBILITY.items():
        best, kind = 0.0, "partial"
        for req in structures:
            s, k = score_structure(cols, req)
            if s > best:
                best, kind = s, k
        if best >= min_score:
            out.append(Match(widget, round(best, 3), kind))
    out.sort(key=lambda m: (-m.score, m.widget))
    return out
