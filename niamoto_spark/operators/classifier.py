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


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes — the cheap, embarrassingly-parallel text
# classifier (domain/language tagging in curation pipelines before a
# heavier model is warranted).  Unlike the GD loop above, the model IS a
# pair of DataFrames — nothing trainable touches the driver, so the fit
# is one shuffle no matter the corpus size, and the entire fit+score is
# replayable in SQL (q174's oracle refits it end-to-end in DuckDB).
# ---------------------------------------------------------------------------

def _nb_tokens(df: DataFrame, id_col: str, text_col: str,
               label_col: str | None) -> DataFrame:
    cols = [F.col(id_col).alias("__doc")]
    if label_col is not None:
        cols.append(F.col(label_col).alias("__y"))
    tok = df.select(*cols,
                    F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
                    .alias("t"))
    return tok.where(F.col("t") != "")


@register("naive_bayes_fit", PluginType.TRANSFORMER)
def naive_bayes_fit(df: DataFrame, id_col: str, text_col: str,
                    label_col: str, alpha: float = 1.0
                    ) -> dict[str, object]:
    """Fit multinomial NB.  Returns a model dict:

    - ``priors``: (label, logprior, tot) — class log-prior and total
      token count; |classes| rows, always broadcastable.
    - ``token_lp``: (label, t, cnt) — per-(class, token) occurrence
      counts; |classes|·|vocab| rows at most, the shuffled fit state.
    - ``vocab_size``: |vocab| (one scalar collect, same contract as
      tfidf.py's N).
    - ``alpha``: the Laplace smoothing constant.

    Distribution: the whole fit is two hash aggregations over the
    exploded token stream (class counts, class-token counts) — no
    iteration, no driver state beyond one scalar.
    """
    tok = _nb_tokens(df, id_col, text_col, label_col)
    n_docs = df.count()
    priors = (df.groupBy(F.col(label_col).alias("label"))
              .agg(F.count(F.lit(1)).alias("nd")))
    ct = (tok.groupBy(F.col("__y").alias("label"), "t")
          .agg(F.count(F.lit(1)).alias("cnt")))
    tot = ct.groupBy("label").agg(F.sum("cnt").alias("tot"))
    vocab_size = tok.select("t").distinct().count()
    priors = (priors.join(tot, "label")
              .select("label",
                      (F.log(F.col("nd")) - F.log(F.lit(float(n_docs))))
                      .alias("logprior"),
                      "tot"))
    return {"priors": priors, "token_lp": ct,
            "vocab_size": int(vocab_size), "alpha": float(alpha)}


def naive_bayes_score(df: DataFrame, id_col: str, text_col: str,
                      model: dict[str, object]) -> DataFrame:
    """(id, label, score): per-document log-likelihood under EVERY
    class.  The per-doc term-count frame cross-joins the (tiny,
    broadcast) class list, left-joins the class-token counts, and one
    aggregation sums count·logp + logprior.  Unseen (class, token)
    pairs fall back to the smoothing floor ln(alpha / (tot + alpha·V))
    — expressed with coalesce, not a second join.
    """
    alpha, v = model["alpha"], model["vocab_size"]
    tc = (_nb_tokens(df, id_col, text_col, None)
          .groupBy("__doc", "t").agg(F.count(F.lit(1)).alias("c")))
    priors = model["priors"]
    pairs = tc.crossJoin(F.broadcast(priors))
    scored = pairs.join(model["token_lp"], ["label", "t"], "left")
    logp = (F.log(F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
            - F.log(F.col("tot") + F.lit(alpha) * F.lit(float(v))))
    return (scored.groupBy(F.col("__doc").alias(id_col), "label")
            .agg((F.first("logprior")
                  + F.sum(F.col("c") * logp)).alias("score")))


def naive_bayes_predict(df: DataFrame, id_col: str, text_col: str,
                        model: dict[str, object],
                        round_dp: int = 4) -> DataFrame:
    """(id, label): argmax class per document.  Scores are rounded to
    ``round_dp`` BEFORE the argmax with the class name as tiebreaker,
    so the prediction is stable across engines and float-sum orders
    (the same determinism recipe as q149's 4dp score match)."""
    from pyspark.sql import Window

    scores = naive_bayes_score(df, id_col, text_col, model)
    w = (Window.partitionBy(id_col)
         .orderBy(F.round("score", round_dp).desc(), F.col("label")))
    return (scores.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select(id_col, "label"))
