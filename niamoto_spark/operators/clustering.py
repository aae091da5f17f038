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
    base = (df.where(F.col(id_col).isNotNull()
                     & F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    F.transform(F.col(vec_col),
                                lambda v: v.cast("double")).alias("__v")))

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
    base = (df.where(F.col(id_col).isNotNull()
                     & F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    F.transform(F.col(vec_col),
                                lambda v: v.cast("double")).alias("__v")))
    out = _assign(base, "__id", "__v", cents)
    return out.select(F.col("__id").alias(id_col), "cluster_id",
                      F.col("__d2").alias("d2"))


def kmeans_cluster_profile(df: DataFrame, id_col: str, vec_col: str,
                           k: int = 8, iters: int = 2,
                           round_dp: int = 3) -> DataFrame:
    """(cluster_id, n_members, mean_d2) after a full deterministic fit —
    the oracle-checked surface (integer counts + one rounded float)."""
    # NULL ids/vectors are excluded inside kmeans_fit/assign (pinned
    # semantic: they can neither seed, train, nor be assigned)
    cents = kmeans_fit(df, id_col, vec_col, k, iters)
    a = kmeans_assign(df, id_col, vec_col, cents)
    return (a.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.round(F.avg("d2"), round_dp).alias("mean_d2")))


@register("dbscan", PluginType.TRANSFORMER)
def dbscan(df: DataFrame, id_col: str, x_col: str, y_col: str,
           eps: float, min_pts: int) -> DataFrame:
    """Density-based clustering (DBSCAN) on planar coordinates:
    core points have ≥ ``min_pts`` neighbors within ``eps``
    (themselves included, the standard convention); clusters are the
    connected components of the core-core ≤ eps graph; border points
    attach to their MINIMUM core neighbor's cluster (the
    deterministic tie rule — textbook DBSCAN leaves border
    assignment order-dependent); everything else is noise (-1).

    Distribution: neighbor candidates come from an eps-grid bucket
    join (each point probes its 9 cells — the proximity_join recipe,
    Euclidean), so pair generation is equi-join shaped and never
    all-pairs; the component step reuses connected_components
    (min-label propagation to fixpoint).  Deterministic end-to-end —
    the oracle replays the neighbor counts, the core graph (via
    WITH RECURSIVE) and the border rule.

    Returns (id, is_core, cluster) — cluster = min core-point id of
    the component, or -1 for noise.
    """
    from niamoto_spark.operators.components import connected_components

    pts = df.select(F.col(id_col).alias("id"),
                    F.col(x_col).cast("double").alias("x"),
                    F.col(y_col).cast("double").alias("y"))
    cx = F.floor(F.col("x") / eps).cast("long")
    cy = F.floor(F.col("y") / eps).cast("long")
    a = pts.withColumn("__cx", cx).withColumn("__cy", cy)
    neigh = F.expr("explode(flatten(transform(sequence(-1, 1), dx -> "
                   "transform(sequence(-1, 1), dy -> "
                   "struct(dx AS dx, dy AS dy)))))")
    b = (pts.select(F.col("id").alias("id_b"),
                    F.col("x").alias("xb"), F.col("y").alias("yb"))
         .withColumn("__bx", F.floor(F.col("xb") / eps).cast("long"))
         .withColumn("__by", F.floor(F.col("yb") / eps).cast("long"))
         .select("*", neigh.alias("__n"))
         .withColumn("__cx", F.col("__bx") + F.col("__n.dx"))
         .withColumn("__cy", F.col("__by") + F.col("__n.dy"))
         .drop("__n", "__bx", "__by"))
    d2 = ((F.col("x") - F.col("xb")) ** 2
          + (F.col("y") - F.col("yb")) ** 2)
    pairs = (a.join(b, ["__cx", "__cy"])
             .where((d2 <= F.lit(float(eps) ** 2))
                    & (F.col("id") != F.col("id_b")))
             .select("id", "id_b").distinct())
    counts = pairs.groupBy("id").agg(
        (F.count(F.lit(1)) + 1).alias("n_nbrs"))   # +1: self
    core = (pts.join(counts, "id", "left")
            .withColumn("is_core",
                        F.coalesce("n_nbrs", F.lit(1))
                        >= F.lit(int(min_pts)))
            .select("id", "is_core"))
    core_ids = core.where("is_core").select("id")
    core_edges = (pairs
                  .join(core_ids, "id", "left_semi")
                  .join(core_ids.withColumnRenamed("id", "id_b"),
                        "id_b", "left_semi")
                  .where(F.col("id") < F.col("id_b"))
                  .select(F.col("id").alias("id_a"), "id_b"))
    # min-label propagation advances one hop per round: the cap must
    # cover the core graph's DIAMETER (dense eps-blobs can chain far),
    # and the loop early-breaks at the fixpoint
    comp = connected_components(core_edges, max_iterations=64)
    # singleton cores (no core neighbor) form their own cluster
    core_cluster = (core_ids
                    .join(comp, core_ids["id"] == comp["node_id"],
                          "left")
                    .select("id", F.coalesce("component_id", "id")
                            .alias("cluster")))
    border = (pairs
              .join(core.where(~F.col("is_core")), "id", "left_semi")
              .join(core_cluster.withColumnRenamed("id", "id_b")
                    .withColumnRenamed("cluster", "__bc"), "id_b")
              .groupBy("id").agg(F.min("__bc").alias("cluster")))
    assigned = core_cluster.unionByName(border)
    return (core.join(assigned, "id", "left")
            .select("id", "is_core",
                    F.coalesce("cluster", F.lit(-1)).alias("cluster")))


@register("silhouette_simplified", PluginType.TRANSFORMER)
def silhouette_simplified(df: DataFrame, id_col: str, vec_col: str,
                          cents: DataFrame,
                          round_dp: int = 4) -> DataFrame:
    """Simplified silhouette (Hruschka et al.): per point,
    a = distance to OWN centroid, b = distance to the nearest OTHER
    centroid, s = (b − a) / max(a, b); per-cluster mean s plus size.
    The exact silhouette's O(n²) pairwise distances make it
    uncomputable at corpus scale; the centroid form is the standard
    surrogate and needs only a broadcast of k centroids — one scan,
    one aggregate, same cost as kmeans_assign.

    s near 1: tight, well-separated cluster; near 0: boundary; < 0:
    points closer to another centroid than their own (mis-clustered).
    Returns (cluster_id, n, mean_silhouette)."""
    base = (df.where(F.col(id_col).isNotNull()
                     & F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    F.transform(F.col(vec_col),
                                lambda v: v.cast("double")).alias("__v")))
    pairs = base.crossJoin(
        F.broadcast(cents.select(F.col("cluster_id").alias("cid"),
                                 "cent_vec")))
    d2 = F.aggregate(
        F.zip_with(F.col("__v"), F.col("cent_vec"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    from pyspark.sql import Window

    scored = pairs.select("__id", "cid", F.sqrt(d2).alias("d"))
    own = scored.withColumn(
        "__rn", F.row_number().over(
            Window.partitionBy("__id").orderBy("d", "cid")))
    # nearest centroid = own cluster (the kmeans_assign invariant);
    # second nearest = b
    a = own.where(F.col("__rn") == 1).select(
        "__id", F.col("cid").alias("cluster_id"), F.col("d").alias("a"))
    b = own.where(F.col("__rn") == 2).select(
        "__id", F.col("d").alias("b"))
    s = (a.join(b, "__id")
         .withColumn("s", F.when(F.greatest("a", "b") > 0,
                                 (F.col("b") - F.col("a"))
                                 / F.greatest("a", "b"))
                     .otherwise(0.0)))
    return (s.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("s"), round_dp).alias("mean_silhouette")))


@register("knn_classify", PluginType.TRANSFORMER)
def knn_classify(train: DataFrame, test: DataFrame, id_col: str,
                 vec_col: str, label_col: str, k: int = 5) -> DataFrame:
    """k-nearest-neighbor classification by cosine similarity (dot
    product on normalized embeddings): each test vector takes the
    majority label of its k nearest TRAIN vectors — the zero-training
    baseline every embedding space is judged by.

    Brute-force scoring (test × train dot products) with the train
    side streamed and the test side broadcast — right when test is
    the small side (eval sets are); at larger test sets the IVF/SQ
    lanes bound the candidate set first.  Majority ties break to the
    SMALLER label (deterministic).  Returns (test id, pred_label,
    votes)."""
    from pyspark.sql import Window

    # pinned NULL semantic: a test row with a NULL id/vector can't be
    # classified; a train row with a NULL vector can't be ranked and one
    # with a NULL label can't vote — all excluded (oracles pin the same)
    t = (test.where(F.col(id_col).isNotNull()
                    & F.col(vec_col).isNotNull())
         .select(F.col(id_col).alias("qid"),
                 F.transform(F.col(vec_col),
                             lambda v: v.cast("double")).alias("qv")))
    tr = (train.where(F.col(id_col).isNotNull()
                      & F.col(vec_col).isNotNull()
                      & F.col(label_col).isNotNull())
          .select(F.col(id_col).alias("tid"),
                  F.transform(F.col(vec_col),
                              lambda v: v.cast("double")).alias("tv"),
                  F.col(label_col).alias("lbl")))
    pairs = tr.crossJoin(F.broadcast(t))
    score = F.aggregate(
        F.zip_with(F.col("qv"), F.col("tv"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    wk = Window.partitionBy("qid").orderBy(F.col("score").desc(),
                                           F.col("tid"))
    nn = (pairs.select("qid", "tid", "lbl", score.alias("score"))
          .withColumn("__rn", F.row_number().over(wk))
          .where(F.col("__rn") <= k))
    votes = nn.groupBy("qid", "lbl").agg(F.count(F.lit(1)).alias("votes"))
    wv = Window.partitionBy("qid").orderBy(F.col("votes").desc(),
                                           F.col("lbl"))
    return (votes.withColumn("__rn", F.row_number().over(wv))
            .where(F.col("__rn") == 1)
            .select(F.col("qid").alias(id_col),
                    F.col("lbl").alias("pred_label"), "votes"))
