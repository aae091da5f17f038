"""Import profiler (reference: src/niamoto/core/imports/profiler.py) —
pre-import inspection of a source: delimiter, per-column type inference,
null/distinct counts, sample values, and geometry-column detection by the
reference's name heuristics (engine.py:524-586 WKT_COLUMN_PATTERNS).

One Spark pass computes all column stats (a single wide aggregate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference WKT_COLUMN_PATTERNS (engine.py:527)
WKT_COLUMN_NAMES = ("geo_pt", "geo", "wkt", "geometry", "geom", "the_geom")


def profile_dataframe(df: DataFrame, sample_values: int = 3) -> list[dict]:
    """Per-column profile: dtype, nulls, distincts, samples, geometry flag."""
    n = df.count()
    aggs = []
    for c in df.columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__dc_{c}"))
    stats = df.agg(*aggs).collect()[0]
    samples = df.limit(sample_values).collect()
    out = []
    for c, dtype in df.dtypes:
        looks_geo = c.lower() in WKT_COLUMN_NAMES or (
            dtype == "string" and any(
                str(r[c] or "").lstrip().upper().startswith(
                    ("POINT", "POLYGON", "MULTIPOLYGON", "LINESTRING"))
                for r in samples))
        out.append({
            "column": c,
            "dtype": dtype,
            "rows": n,
            "nulls": n - stats[f"__nn_{c}"],
            "approx_distinct": stats[f"__dc_{c}"],
            "samples": [r[c] for r in samples],
            "geometry": looks_geo,
        })
    return out


def profile_csv(spark: SparkSession, path: str, **options) -> dict:
    from niamoto_spark.sources.files import read_csv_auto, sniff_delimiter

    delim = sniff_delimiter(path)
    df = read_csv_auto(spark, path, **options)
    return {"path": path, "delimiter": delim,
            "columns": profile_dataframe(df)}
