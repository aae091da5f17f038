"""Persisted ANN index: build an IVF index ONCE, store it as manifest
tables, and serve top-k queries against the stored index without
re-clustering or re-assigning the corpus.

At 100 TB the index build (centroid pick + full-corpus assignment) is
the expensive pass; queries arrive continuously.  Rebuilding per query
batch — what a naive ivf_topk call does — re-pays the corpus scan every
time.  Here the build artifacts are tables:

    <path>/centroids    (centroid_id, cent_vec)        — tiny, broadcast
    <path>/assignments  (bucket, neighbor_id, c_vec)   — corpus-sized,
                        WRITTEN PARTITIONED BY bucket-sorted layout so a
                        query's nprobe buckets prune to a few files via
                        the manifest zone maps

and a query is: assign the (small) query batch to centroids, then an
equi-join against ONLY the probed buckets.  The snapshot semantics of
the manifest format give the index atomic rebuilds (overwrite) and time
travel for free.

Results are IDENTICAL to a direct ivf_topk call with the same
parameters (same centroid pick, same assignment, same scoring —
shared helpers in similarity.py; pinned by test)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from niamoto_spark.operators.similarity import (_assign_nearest,
                                                _ivf_score,
                                                _non_null_vectors,
                                                _pick_centroids)
from niamoto_spark.registry import PluginType, register
from niamoto_spark.sources import manifest


def build_ivf_index(corpus: DataFrame, id_col: str, vec_col: str,
                    n_centroids: int = 16, replication: int = 1,
                    use_kmeans: bool = False) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments) frames for the IVF index."""
    c = _non_null_vectors(corpus, id_col, vec_col) \
        .select(F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"))
    cents = _pick_centroids(c, n_centroids, use_kmeans)
    assigned = _assign_nearest(c, cents, "c_vec", "bucket",
                               max(replication, 1))
    return cents, assigned


@register("save_ivf_index", PluginType.TRANSFORMER)
def save_ivf_index(corpus: DataFrame, path: str, id_col: str,
                   vec_col: str, n_centroids: int = 16,
                   replication: int = 1,
                   use_kmeans: bool = False) -> dict:
    """Build and persist the index under ``path``; returns build stats.

    Assignments are repartitioned by bucket and sorted within
    partitions, so each parquet file covers few buckets — the bucket
    zone maps collected at commit time then let read-side pruning skip
    every file outside the probed buckets."""
    cents, assigned = build_ivf_index(corpus, id_col, vec_col,
                                      n_centroids, replication, use_kmeans)
    clustered = (assigned.repartition("bucket")
                 .sortWithinPartitions("bucket", "neighbor_id"))
    manifest.overwrite(cents, f"{path}/centroids")
    manifest.overwrite_with_stats(
        clustered, f"{path}/assignments", stats_cols=["bucket"])
    n = assigned.count()
    return {"path": path, "n_centroids": n_centroids,
            "n_assignments": n, "replication": max(replication, 1)}


def query_ivf_index(spark: SparkSession, path: str, queries: DataFrame,
                    id_col: str, vec_col: str, k: int = 10,
                    nprobe: int = 4,
                    round_dp: int | None = 6) -> DataFrame:
    """Top-k against the stored index: NO corpus pass — centroids load
    broadcast-sized, query rows are assigned to their nprobe buckets,
    and the assignments read is ZONE-MAP PRUNED to the probed bucket
    RANGE before the bucket equi-join (one pruned read, not one per
    bucket — per-bucket reads would scan a file covering several probed
    buckets once per bucket and duplicate its rows into the scoring
    join).  The probed bucket set is query-batch-sized, so collecting
    it costs one tiny job over the queries only."""
    cents = manifest.read_table(spark, f"{path}/centroids")
    q = _non_null_vectors(queries, id_col, vec_col) \
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("q_vec"))
    q_assigned = _assign_nearest(q, cents, "q_vec", "bucket", nprobe) \
        .localCheckpoint(eager=True)   # consumed by the probe set + join
    probed = [r["bucket"] for r in
              q_assigned.select("bucket").distinct().collect()]
    if not probed:
        assigned = manifest.read_table(
            spark, f"{path}/assignments").limit(0)
    else:
        assigned, _, _ = manifest.read_table_pruned(
            spark, f"{path}/assignments", "bucket",
            min(probed), max(probed))
        if "bucket" not in assigned.columns:
            # every file pruned (placeholder frame): empty typed read
            assigned = manifest.read_table(
                spark, f"{path}/assignments").limit(0)
    return _ivf_score(assigned, q_assigned, k, round_dp)
