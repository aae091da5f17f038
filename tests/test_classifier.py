"""Distributed logistic-regression text classifier tests."""

from pyspark.sql import functions as F


def _corpus(spark):
    pos = [(i, "the quick brown fox jumps", 1) for i in range(40)]
    neg = [(100 + i, "der schnelle braune fuchs springt", 0)
           for i in range(40)]
    return spark.createDataFrame(pos + neg,
                                 "doc_id long, text string, y int")


def test_classifier_learns_separable_labels(spark):
    from niamoto_spark.operators.classifier import (score_text_classifier,
                                                    train_text_classifier)

    df = _corpus(spark)
    w, b = train_text_classifier(df, "doc_id", "text", "y",
                                 n_buckets=256, iters=5, lr=1.0)
    scores = {r["doc_id"]: r["p"]
              for r in score_text_classifier(df, "doc_id", "text", w, b,
                                             n_buckets=256).collect()}
    assert min(scores[i] for i in range(40)) > \
        max(scores[100 + i] for i in range(40))


def test_classifier_reduces_log_loss(spark):
    import math

    from niamoto_spark.operators.classifier import (score_text_classifier,
                                                    train_text_classifier)

    df = _corpus(spark)
    y = {r["doc_id"]: r["y"] for r in df.collect()}

    def loss(iters):
        w, b = train_text_classifier(df, "doc_id", "text", "y",
                                     n_buckets=256, iters=iters, lr=1.0)
        p = {r["doc_id"]: min(max(r["p"], 1e-9), 1 - 1e-9)
             for r in score_text_classifier(
                 df, "doc_id", "text", w, b, n_buckets=256).collect()}
        return -sum(y[d] * math.log(p[d]) + (1 - y[d]) * math.log(1 - p[d])
                    for d in y) / len(y)

    l1, l5 = loss(1), loss(5)
    assert l5 < l1 < math.log(2) + 1e-9  # iter0 loss is exactly ln 2


def test_classifier_partitioning_invariant_to_4dp(spark):
    from niamoto_spark.operators.classifier import (score_text_classifier,
                                                    train_text_classifier)

    df = _corpus(spark)
    outs = []
    for parts in (1, 7):
        d = df.repartition(parts)
        w, b = train_text_classifier(d, "doc_id", "text", "y",
                                     n_buckets=128, iters=3, lr=0.5)
        outs.append({r["doc_id"]: round(r["p"], 4)
                     for r in score_text_classifier(
                         d, "doc_id", "text", w, b,
                         n_buckets=128).collect()})
    assert outs[0] == outs[1]


def test_classifier_driver_state_bounded(spark):
    """Weights dict is bounded by n_buckets regardless of corpus or
    vocabulary size."""
    from niamoto_spark.operators.classifier import train_text_classifier

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id")).alias("text"),
        (F.col("id") % 2).cast("int").alias("y"))
    w, _ = train_text_classifier(df, "doc_id", "text", "y",
                                 n_buckets=64, iters=1)
    assert len(w) <= 64
