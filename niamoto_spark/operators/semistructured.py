"""Semi-structured (JSON) column handling: schema inference, parsing,
and recursive flattening — the lane a warehouse needs for event
payloads, API captures, and scraped-page metadata.

The reference stores entity payloads as JSON TEXT columns and re-parses
them per access (src/niamoto/core/plugins/loaders/*, generated API
JSON); here the JSON becomes a typed struct ONCE (`from_json`, JVM-side
Jackson parse inside codegen — no Python) and every downstream access
is a pruned column read.

Scale: `infer_json_schema` reads a bounded driver-side sample (schema
is driver state by definition); `parse_json` / `flatten_json` are pure
projections — no shuffle, no UDF, fully pipelined with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from niamoto_spark.registry import PluginType, register


def infer_json_schema(df: DataFrame, json_col: str,
                      sample_rows: int = 1000) -> T.StructType:
    """Infer a struct schema for a JSON string column from a bounded
    sample.  Spark's own JSON reader does the inference (same code
    path as ``spark.read.json``), so optional keys and type widening
    (int -> double -> string) follow Spark semantics exactly.  The
    sample is ``limit(sample_rows)`` — one driver-bounded collect, the
    same contract as every schema-discovery step."""
    spark = df.sparkSession
    sample = [r[0] for r in df.select(json_col).where(
        F.col(json_col).isNotNull()).limit(sample_rows).collect()]
    if not sample:
        return T.StructType([])
    return spark.read.json(
        spark.sparkContext.parallelize(sample, 1)).schema


@register("parse_json", PluginType.TRANSFORMER)
def parse_json(df: DataFrame, json_col: str,
               schema: T.StructType | None = None,
               out_col: str | None = None,
               sample_rows: int = 1000) -> DataFrame:
    """Parse a JSON string column to a typed struct column (named
    ``out_col``, default ``<json_col>_parsed``).  Malformed rows
    become null structs (PERMISSIVE), never job failures."""
    if schema is None:
        schema = infer_json_schema(df, json_col, sample_rows)
    out = out_col or f"{json_col}_parsed"
    return df.withColumn(
        out, F.from_json(F.col(json_col), schema,
                         {"mode": "PERMISSIVE"}))


def _leaf_paths(schema: T.StructType, prefix: str = "") -> list[str]:
    paths = []
    for f in schema.fields:
        p = f"{prefix}.{f.name}" if prefix else f.name
        if isinstance(f.dataType, T.StructType):
            paths.extend(_leaf_paths(f.dataType, p))
        else:
            paths.append(p)
    return paths


@register("flatten_json", PluginType.TRANSFORMER)
def flatten_json(df: DataFrame, json_col: str,
                 schema: T.StructType | None = None,
                 prefix: str = "", sep: str = "_",
                 sample_rows: int = 1000) -> DataFrame:
    """Parse + recursively flatten: every leaf field of the (inferred
    or given) struct becomes a top-level column named by its dotted
    path with ``sep`` separators.  Arrays stay arrays (exploding is a
    cardinality decision the caller owns).  The parse and all leaf
    projections are one narrow projection — column pruning reaches the
    Jackson parse, so selecting two leaves parses only those paths."""
    if schema is None:
        schema = infer_json_schema(df, json_col, sample_rows)
    parsed = F.from_json(F.col(json_col), schema, {"mode": "PERMISSIVE"})
    others = [c for c in df.columns if c != json_col]
    leaves = [(p, (prefix + p.replace(".", sep)))
              for p in _leaf_paths(schema)]
    return df.select(
        *others,
        *[_nested(parsed, p).alias(name) for p, name in leaves])


def _nested(col, dotted: str):
    out = col
    for part in dotted.split("."):
        out = out.getField(part)
    return out


@register("to_variant", PluginType.TRANSFORMER)
def to_variant(df: DataFrame, json_col: str,
               out_col: str | None = None) -> DataFrame:
    """Parse a JSON string column to Spark 4's VARIANT type — the
    schema-on-read column for payloads whose shape drifts faster than
    a struct schema can evolve (open telemetry attributes, vendor
    API blobs).  Unlike from_json, no schema is fixed at parse time;
    paths are bound at ACCESS time with variant_extract, and the
    binary variant encoding stays columnar."""
    out = out_col or f"{json_col}_variant"
    return df.withColumn(out, F.parse_json(F.col(json_col)))


def variant_extract(df: DataFrame, variant_col: str,
                    paths: "dict[str, tuple[str, str]]") -> DataFrame:
    """Project typed fields out of a VARIANT column: ``paths`` maps
    output name -> (variant path like '$.k' or '$.tags[0]', Spark
    type).  try_variant_get semantics: type mismatch or missing path
    is null, never an error."""
    cols = [F.try_variant_get(F.col(variant_col), p, t).alias(name)
            for name, (p, t) in paths.items()]
    others = [c for c in df.columns if c != variant_col]
    return df.select(*others, *cols)
