"""File sources (SURVEY §2.1).

- CSV/TSV with delimiter sniffing: the reference sniffs on a sample then
  reads natively (engine.py:169-287, profiler.py:288-310).  Here the sniff
  reads a few KB on the driver, then hands off to Spark's distributed CSV
  reader with an explicit delimiter + header flag; schema inference is
  Spark's (or pass an explicit StructType for production stability).
- XLSX: read via pandas on the driver (small files by nature), converted
  through Arrow into a DataFrame — mirrors profiler.py:219-259.  Gated on
  openpyxl availability.
- Vector files (.gpkg/.shp/.geojson): the reference reads via geopandas
  (engine.py:371-520).  geopandas is unavailable here; GeoJSON gets a
  native parser (json -> WKT strings), others raise with guidance.
"""

from __future__ import annotations

import csv
import json

from pyspark.sql import DataFrame, SparkSession


def sniff_delimiter(path: str, sample_bytes: int = 64 * 1024,
                    candidates: str = ",;\t|") -> str:
    with open(path, "r", errors="replace") as f:
        sample = f.read(sample_bytes)
    try:
        return csv.Sniffer().sniff(sample, delimiters=candidates).delimiter
    except csv.Error:
        counts = {d: sample.count(d) for d in candidates}
        return max(counts, key=counts.get)


def read_csv_auto(spark: SparkSession, path: str, header: bool = True,
                  schema=None, **options) -> DataFrame:
    """Delimiter-sniffed CSV scan (reference read_csv_auto path,
    engine.py:219-227).  Explicit ``schema`` skips the inference pass —
    always pass one at scale (inference reads the data twice)."""
    delim = sniff_delimiter(path)
    reader = spark.read.option("header", str(header).lower()) \
                       .option("sep", delim)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_xlsx(spark: SparkSession, path: str, sheet: int | str = 0) -> DataFrame:
    """XLSX scan (reference profiler.py:219-259 via pandas/openpyxl).
    openpyxl when available; otherwise the pure-python stdlib parser in
    sources/xlsx.py — no dependency gate either way."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet)
        return spark.createDataFrame(pdf)
    except ImportError:
        from niamoto_spark.sources.xlsx import read_xlsx_native

        return read_xlsx_native(spark, path, sheet)


def _geojson_geom_to_wkt(geom: dict) -> str:
    t = geom["type"].upper()
    c = geom["coordinates"]

    def ring(r):
        return "(" + ", ".join(f"{x} {y}" for x, y, *_ in r) + ")"

    if t == "POINT":
        return f"POINT ({c[0]} {c[1]})"
    if t == "POLYGON":
        return "POLYGON (" + ", ".join(ring(r) for r in c) + ")"
    if t == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(ring(r) for r in poly) + ")" for poly in c) + ")"
    if t == "LINESTRING":
        return "LINESTRING " + ring(c).replace("(", "(", 1)
    raise ValueError(f"unsupported geometry type {t}")


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """GeoJSON FeatureCollection -> DataFrame with properties + geometry_wkt
    (WKT-first convention, SURVEY §7.2).  Features are few (vector layers);
    parsed on the driver like the reference's gpd.read_file."""
    with open(path) as f:
        fc = json.load(f)
    rows = []
    for feat in fc.get("features", []):
        row = dict(feat.get("properties") or {})
        row["geometry_wkt"] = _geojson_geom_to_wkt(feat["geometry"]) \
            if feat.get("geometry") else None
        rows.append(row)
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(rows))


def read_vector(spark: SparkSession, path: str,
                layer: str | None = None) -> DataFrame:
    """Vector-file scan matching the reference's gpd.read_file surface
    (engine.py:371-520): GeoJSON native, .shp/.dbf and .gpkg via the
    pure-python parsers in sources/vector.py.  All return a DataFrame with
    attributes + ``geometry_wkt``."""
    from niamoto_spark.sources.vector import read_gpkg, read_shp

    if path.endswith(".geojson") or path.endswith(".json"):
        return read_geojson(spark, path)
    if path.endswith(".shp"):
        return read_shp(spark, path)
    if path.endswith(".gpkg"):
        return read_gpkg(spark, path, layer=layer)
    raise NotImplementedError(
        f"unsupported vector format for {path!r}; expected "
        ".geojson/.json/.shp/.gpkg (or convert to parquet+WKT upstream)")


def read_any(spark: SparkSession, path: str, **options) -> DataFrame:
    """Format-dispatched scan by extension: parquet / orc / csv-tsv
    (delimiter-sniffed) / json-jsonl / xlsx / vector formats — the
    single entry point a pipeline config names a file through (the
    reference dispatches on extension in its importer service;
    core/services/importer.py).  ORC and JSON ride Spark's native
    vectorized readers, so predicate pushdown and column pruning work
    exactly as for parquet."""
    low = path.lower()
    if low.endswith((".parquet", ".pq")):
        return spark.read.options(**options).parquet(path)
    if low.endswith(".orc"):
        return spark.read.options(**options).orc(path)
    if low.endswith((".json", ".jsonl", ".ndjson")):
        return spark.read.options(**options).json(path)
    if low.endswith((".csv", ".tsv", ".txt")):
        return read_csv_auto(spark, path, **options)
    if low.endswith((".xlsx",)):
        return read_xlsx(spark, path)
    if low.endswith((".geojson", ".shp", ".gpkg", ".wkb")):
        return read_vector(spark, path)
    raise ValueError(f"read_any: unrecognized extension on {path!r}")


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: "list[str] | None" = None) -> None:
    """ORC sink (Spark-native writer: dictionary + RLE encodings,
    built-in column statistics — the other columnar interchange format
    warehouses expect besides parquet)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
