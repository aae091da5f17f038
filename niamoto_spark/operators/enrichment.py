"""Enrichment operators.

- ``reference_enrichment_profile``: normalize JSON enrichment payloads into
  typed display items (reference: transformers/aggregation/
  reference_enrichment_profile.py:1-60) — a ``from_json`` + projection, all
  JVM-side.
- ``api_enrichment``: the reference's HTTP-enrichment loader family
  (api_taxonomy_enricher.py:52-290) re-shaped for a distributed engine:
  the DISTINCT key set is collected to the driver (dedup first — the
  reference enriches per-row), fetched through a rate-limited, cached
  client, and joined back as a broadcast map.  The HTTP transport is
  injectable so tests (and this offline container) use a fake fetcher.
"""

from __future__ import annotations

import json
import time
from typing import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("reference_enrichment_profile", PluginType.TRANSFORMER)
def reference_enrichment_profile(df: DataFrame, json_col: str,
                                 fields: Mapping[str, str],
                                 item_types: Mapping[str, str] | None = None,
                                 ) -> DataFrame:
    """Extract dot-path fields from a JSON payload column into display items.

    ``fields``: output name -> JSON path (without leading $).
    ``item_types``: output name -> display type tag (text/number/badge/...).
    Output: original columns + one struct column ``profile`` with an entry
    per field: (label, value, type).
    """
    item_types = item_types or {}
    items = [
        F.struct(
            F.lit(label).alias("label"),
            F.get_json_object(F.col(json_col), f"$.{path}").alias("value"),
            F.lit(item_types.get(label, "text")).alias("type"),
        )
        for label, path in fields.items()
    ]
    return df.withColumn("profile", F.array(*items))


class RateLimitedCache:
    """Driver-side fetch coordinator: ``rate_limit`` requests/sec + an
    in-memory cache keyed by a stable string (reference
    api_taxonomy_enricher._stable_cache_key :52-56, rate_limit :213,
    cache :218-220)."""

    def __init__(self, fetcher: Callable[[str], dict],
                 rate_limit: float = 2.0,
                 clock=time.monotonic, sleeper=time.sleep):
        self.fetcher = fetcher
        self.min_interval = 1.0 / rate_limit if rate_limit > 0 else 0.0
        self.cache: dict[str, dict] = {}
        self._last = float("-inf")
        self._clock, self._sleep = clock, sleeper
        self.fetch_count = 0

    def get(self, key: str) -> dict:
        if key in self.cache:
            return self.cache[key]
        wait = self.min_interval - (self._clock() - self._last)
        if wait > 0:
            self._sleep(wait)
        self._last = self._clock()
        self.fetch_count += 1
        result = self.fetcher(key)
        self.cache[key] = result
        return result


@register("api_enrichment", PluginType.LOADER)
def api_enrichment(df: DataFrame, key_col: str,
                   fetcher: Callable[[str], dict],
                   rate_limit: float = 2.0,
                   out_col: str = "extra_data",
                   response_mapping: Mapping[str, str] | None = None,
                   client: RateLimitedCache | None = None) -> DataFrame:
    """Enrich rows via an external lookup on the DISTINCT key set.

    Scale design: keys are deduplicated in Spark (reference tables are
    small; the *distinct key* cardinality is what matters), fetched on the
    driver under the rate limiter (a 1000-executor fleet must not multiply
    the rate), then joined back as a broadcast map — the fact table never
    moves.
    """
    client = client or RateLimitedCache(fetcher, rate_limit)
    keys = [r[0] for r in df.select(key_col).distinct().collect()]
    rows = []
    for k in sorted(keys, key=str):
        payload = client.get(str(k))
        if response_mapping:
            payload = {out: payload.get(src) for out, src in response_mapping.items()}
        rows.append((k, json.dumps(payload, sort_keys=True)))
    spark = df.sparkSession
    key_type = dict(df.dtypes)[key_col]
    enrich = spark.createDataFrame(rows, f"__k {key_type}, {out_col} string")
    return df.join(F.broadcast(enrich), df[key_col] == F.col("__k"), "left") \
             .drop("__k")


# The reference registers three HTTP-enricher loaders (taxonomy / spatial /
# elevation siblings, SURVEY §2.1); all share the generic rate-limited
# distinct-key mechanism above, so they alias it — a config naming any of
# them resolves to the same loader with its own fetcher/mapping params.
for _alias in ("api_taxonomy_enricher", "api_spatial_enricher",
               "api_elevation_enricher"):
    register(_alias, PluginType.LOADER)(api_enrichment)


@register("custom_formatter", PluginType.TRANSFORMER)
def custom_formatter(df: DataFrame,
                     rename: Mapping[str, str] | None = None,
                     select: list[str] | None = None,
                     literals: Mapping[str, object] | None = None) -> DataFrame:
    """Output reshaping (reference: transformers/ecological/
    custom_formatter.py:130-165): rename/select/constant-inject — pure
    projection."""
    out = df
    for old, new in (rename or {}).items():
        out = out.withColumnRenamed(old, new)
    for name, val in (literals or {}).items():
        out = out.withColumn(name, F.lit(val))
    if select:
        out = out.select(*select)
    return out
