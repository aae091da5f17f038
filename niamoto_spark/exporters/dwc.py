"""Darwin Core projection (reference:
transformers/formats/niamoto_to_dwc_occurrence.py:100-560).

The reference maps source rows to DwC terms through a declarative DSL:
``@source.field`` references, literal values, and generators
(``unique_occurrence_id``).  Here the mapping compiles to one Spark
``select`` projection — a pure narrow transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


def _compile_term(spec, df: DataFrame) -> Column:
    if isinstance(spec, str) and spec.startswith("@source."):
        return F.col(spec[len("@source."):])
    if isinstance(spec, dict) and "generator" in spec:
        gen = spec["generator"]
        if gen == "unique_occurrence_id":
            prefix = spec.get("params", {}).get("prefix", "occ_")
            src = spec.get("params", {}).get("source_field", df.columns[0])
            return F.concat(F.lit(prefix), F.col(src).cast("string"))
        if gen == "format_coordinates":
            wkt = spec["params"]["source_field"]
            from niamoto_spark.operators.geospatial import point_lat, point_lon
            which = spec["params"].get("axis", "lat")
            return (point_lat if which == "lat" else point_lon)(F.col(wkt))
        raise ValueError(f"unknown generator {gen!r}")
    return F.lit(spec)


@register("niamoto_to_dwc_occurrence", PluginType.TRANSFORMER)
def to_dwc_occurrence(df: DataFrame, mapping: dict[str, object]) -> DataFrame:
    """Project source rows to Darwin Core terms per the mapping DSL."""
    cols = [_compile_term(spec, df).alias(term) for term, spec in mapping.items()]
    return df.select(*cols)
