"""Deterministic distributed k-means (Lloyd's) over embedding columns.

MLlib's KMeans (used by similarity.ivf_topk's trainer) is fast but its
k-means|| init is RNG-dependent — useless for oracle-checked parity.
This implementation pins every source of nondeterminism so an external
engine can replay it bit-for-bit:

- init: the vectors of the k smallest ids (total order, no RNG);
- assignment: squared-euclidean argmin, ties broken by centroid id;
- update: per-(cluster, dim) mean; empty clusters drop out (both the
  replay and this code lose them identically);
- fixed iteration count (no convergence-epsilon races).

Spark-first shape: assignment is a broadcast crossJoin against the k
centroids (k×dim doubles — broadcastable at any corpus size) ranked by a
per-vector window; the update is posexplode → groupBy(cluster, dim) avg,
a single hash aggregate whose output is k×dim rows — THAT is the only
thing the driver ever collects, so the loop is O(iters) jobs with O(k·d)
driver state, never O(n).  Used standalone and as a drop-in replacement
trainer for ivf_topk when reproducibility matters more than init
quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


def _dist2(vec_col: str) -> "F.Column":
    return F.aggregate(
        F.zip_with(F.col(vec_col), F.col("cent_vec"),
                   lambda x, y: (x.cast("double") - y) *
                                (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def _assign(df: DataFrame, id_col: str, vec_col: str,
            cents: DataFrame) -> DataFrame:
    w = Window.partitionBy(id_col).orderBy(F.col("__d2").asc(),
                                           F.col("cluster_id").asc())
    return (df.crossJoin(F.broadcast(cents))
            .withColumn("__d2", _dist2(vec_col))
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .drop("__rk", "cent_vec"))


@register("kmeans_fit", PluginType.TRANSFORMER)
def kmeans_fit(df: DataFrame, id_col: str, vec_col: str, k: int = 8,
               iters: int = 2) -> DataFrame:
    """Fit and return the centroid table (cluster_id, cent_vec) after
    ``iters`` Lloyd's iterations from the deterministic min-id init."""
    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("__id"),
                     F.transform(F.col(vec_col),
                                 lambda v: v.cast("double")).alias("__v"))

    init = (base.orderBy("__id").limit(k)
            .select("__id", "__v").collect())  # k rows only
    cents = spark.createDataFrame(
        [(i, list(r["__v"])) for i, r in enumerate(init)],
        "cluster_id int, cent_vec array<double>")

    for _ in range(iters):
        assigned = _assign(base, "__id", "__v", cents)
        new_c = (assigned.select("cluster_id",
                                 F.posexplode("__v").alias("dim", "val"))
                 .groupBy("cluster_id", "dim")
                 .agg(F.avg("val").alias("m"))
                 .collect())  # k*dim rows — bounded driver state
        by_cid: dict[int, dict[int, float]] = {}
        for r in new_c:
            by_cid.setdefault(r["cluster_id"], {})[r["dim"]] = r["m"]
        cents = spark.createDataFrame(
            [(cid, [dims[d] for d in sorted(dims)])
             for cid, dims in sorted(by_cid.items())],
            "cluster_id int, cent_vec array<double>")
    return cents


@register("kmeans_assign", PluginType.TRANSFORMER)
def kmeans_assign(df: DataFrame, id_col: str, vec_col: str,
                  cents: DataFrame) -> DataFrame:
    """(id, cluster_id, d2): final nearest-centroid assignment."""
    base = df.select(F.col(id_col).alias("__id"),
                     F.transform(F.col(vec_col),
                                 lambda v: v.cast("double")).alias("__v"))
    out = _assign(base, "__id", "__v", cents)
    return out.select(F.col("__id").alias(id_col), "cluster_id",
                      F.col("__d2").alias("d2"))


def kmeans_cluster_profile(df: DataFrame, id_col: str, vec_col: str,
                           k: int = 8, iters: int = 2,
                           round_dp: int = 3) -> DataFrame:
    """(cluster_id, n_members, mean_d2) after a full deterministic fit —
    the oracle-checked surface (integer counts + one rounded float)."""
    cents = kmeans_fit(df, id_col, vec_col, k, iters)
    a = kmeans_assign(df, id_col, vec_col, cents)
    return (a.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.round(F.avg("d2"), round_dp).alias("mean_d2")))
