"""Version-keyed result caching over manifest tables ("semantic
cache"): a query's result is reusable exactly until any input table
commits a new version — and manifest tables make that condition
CHECKABLE, because `committed_version` is a single metadata read.

    df, hit = cached_query(spark, root, "daily_revenue",
                           deps=[orders_tbl], build=lambda: ...)

The cache key is md5(query_key | (dep_path, dep_version)...), so a new
commit on any dependency changes the key and the stale entry is simply
never addressed again (vacuum_cache reaps unreferenced entries by age).
Results are parquet directories written through a staging rename —
concurrent builders race benignly (one rename wins, the other's
staging dir is discarded; both return the same rows).

At 100 TB this is the difference between a dashboard refresh costing a
metadata read and costing a fact-table scan; the reference recomputes
every widget query per run (transformer.py:488-541), which is exactly
the pattern this removes.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from niamoto_spark.sources import manifest as M


def _cache_key(query_key: str, deps: "list[str]") -> str:
    h = hashlib.md5()
    h.update(query_key.encode())
    for p in sorted(deps):
        v = M.committed_version(p)
        h.update(f"|{os.path.abspath(p)}@{v}".encode())
    return h.hexdigest()


def cached_query(spark: SparkSession, cache_root: str, query_key: str,
                 deps: "list[str]", build) -> "tuple[DataFrame, bool]":
    """Return (result_df, was_cache_hit).  ``build`` is a zero-arg
    callable producing the DataFrame; it runs only on miss.  ``deps``
    are manifest table paths — the result is keyed to their CURRENT
    committed versions, so any later append/overwrite automatically
    misses (no explicit invalidation call exists or is needed)."""
    os.makedirs(cache_root, exist_ok=True)
    key = _cache_key(query_key, deps)
    final = os.path.join(cache_root, key)
    if os.path.isdir(final):
        return spark.read.parquet(final), True
    df = build()
    staging = os.path.join(cache_root, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    try:
        os.rename(staging, final)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)  # lost the race
    return spark.read.parquet(final), False


def vacuum_cache(cache_root: str, max_age_s: float) -> int:
    """Reap cache entries (and orphaned staging dirs) older than
    ``max_age_s``.  Stale entries are unreachable by construction
    (their key embeds a superseded version), so age is the only
    policy needed.  Returns the number of entries removed."""
    if not os.path.isdir(cache_root):
        return 0
    now = time.time()
    removed = 0
    for name in os.listdir(cache_root):
        p = os.path.join(cache_root, name)
        if os.path.isdir(p) and now - os.path.getmtime(p) > max_age_s:
            shutil.rmtree(p, ignore_errors=True)
            removed += 1
    return removed
