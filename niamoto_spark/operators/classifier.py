"""Distributed linear text classifier — the fastText-style quality /
domain filter every curation pipeline trains (CCNet's LM filter, the
"educational value" classifiers behind phi/FineWeb-Edu), expressed as
pure DataFrame aggregations.

Model: logistic regression over HASHED bag-of-words features (the
hashing trick: token -> md5 bucket in [0, n_buckets); collisions are
part of the model, exactly as in fastText/Vowpal Wabbit).  Training is
full-batch gradient descent where each iteration is TWO shuffles:

1. score: (doc, bucket, count) rows broadcast-join the weight table ->
   groupBy(doc) gives the margin z = b + Σ c·w; p = σ(z);
2. gradient: residual (p - y) fans back over the doc's buckets ->
   groupBy(bucket) gives ∂L/∂w in one aggregation.

Driver state per iteration is the weight vector itself — n_buckets
doubles, independent of corpus size (same contract as clustering.py's
k·dim and graph.py's one scalar).  Everything else stays JVM-side; the
md5 bucketing makes the whole fit replayable in SQL, so q149's oracle
unrolls the full training loop (init -> grad -> step -> grad -> step ->
score) in DuckDB and the scores must match to 4dp.

Reference parity: the reference has no trainable classifier (its ml/
subsystem is out of engine scope, COVERAGE.md); this is an
extension-brief operator for the training-data lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


def hashed_features(df: DataFrame, id_col: str, text_col: str,
                    n_buckets: int = 1024) -> DataFrame:
    """(id, bucket, c): token counts under the hashing trick.  Buckets
    are md5-derived (engine-portable; see sketches._cms_bucket for the
    same recipe) — xxhash64 would be faster but not oracle-replayable."""
    tok = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t"))
    bucket = F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10) \
        .cast("bigint") % n_buckets
    return (tok.select("__doc", bucket.alias("bucket"))
            .groupBy("__doc", "bucket")
            .agg(F.count(F.lit(1)).alias("c")))


def _score(feats: DataFrame, weights: dict[int, float],
           bias: float) -> DataFrame:
    """(doc, z) margins under the current model: broadcast the weight
    table (n_buckets rows), one join + one groupBy(doc)."""
    spark = feats.sparkSession
    if weights:
        w = spark.createDataFrame(
            [(int(k), float(v)) for k, v in weights.items()],
            "bucket bigint, w double")
        joined = feats.join(F.broadcast(w), "bucket", "left")
        contrib = F.coalesce(F.col("w"), F.lit(0.0)) * F.col("c")
    else:
        joined = feats
        contrib = F.lit(0.0)
    return (joined.groupBy("__doc")
            .agg((F.sum(contrib) + F.lit(float(bias))).alias("z")))


@register("train_text_classifier", PluginType.TRANSFORMER)
def train_text_classifier(df: DataFrame, id_col: str, text_col: str,
                          label_col: str, n_buckets: int = 1024,
                          iters: int = 2, lr: float = 0.5
                          ) -> tuple[dict[int, float], float]:
    """Fit logistic regression by full-batch gradient descent; returns
    (weights dict bucket->w, bias).  ``label_col`` must be 0/1.

    Deterministic up to float-sum association (~1e-12 over a few
    iterations) — q149 rounds scores to 4dp for the cross-engine
    check."""
    feats = hashed_features(df, id_col, text_col, n_buckets).persist()
    labels = df.select(F.col(id_col).alias("__doc"),
                       F.col(label_col).cast("double").alias("y"))
    n = labels.count()
    weights: dict[int, float] = {}
    bias = 0.0
    try:
        for _ in range(iters):
            z = _score(feats, weights, bias)
            resid = (labels.join(z, "__doc", "left")
                     .select("__doc",
                             (F.lit(1.0) /
                              (F.lit(1.0) + F.exp(-F.coalesce("z",
                                                              F.lit(0.0))))
                              - F.col("y")).alias("r")))
            grad_rows = (feats.join(resid, "__doc")
                         .groupBy("bucket")
                         .agg((F.sum(F.col("r") * F.col("c"))
                               / F.lit(float(n))).alias("g"))
                         .collect())
            gb = resid.agg((F.sum("r") / F.lit(float(n))).alias("g")) \
                .first()["g"]
            for row in grad_rows:
                b = int(row["bucket"])
                weights[b] = weights.get(b, 0.0) - lr * float(row["g"])
            bias -= lr * float(gb)
        return weights, bias
    finally:
        feats.unpersist()


def score_text_classifier(df: DataFrame, id_col: str, text_col: str,
                          weights: dict[int, float], bias: float,
                          n_buckets: int = 1024,
                          out_col: str = "p") -> DataFrame:
    """(id, p): predicted probability per document under the model."""
    feats = hashed_features(df, id_col, text_col, n_buckets)
    z = _score(feats, weights, bias)
    return (df.select(F.col(id_col))
            .join(z.withColumnRenamed("__doc", id_col), id_col, "left")
            .select(id_col,
                    (F.lit(1.0) / (F.lit(1.0) +
                                   F.exp(-F.coalesce("z", F.lit(float(bias))))))
                    .alias(out_col)))
