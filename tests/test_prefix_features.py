"""Prefix-filtered exact Jaccard join (dedup.py) and leave-one-out
target encoding (features.py)."""

import random

import pytest
from pyspark.sql import functions as F


def _naive_jaccard_pairs(docs, threshold):
    sets = {i: set(t.lower().split()) for i, t in docs}
    out = {}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and round(inter / union, 4) >= threshold:
                out[(a, b)] = round(inter / union, 4)
    return out


def test_prefix_join_exact_vs_naive(spark):
    from niamoto_spark.operators.dedup import jaccard_join_prefix

    rng = random.Random(17)
    vocab = [f"w{k}" for k in range(40)]
    docs = [(i, " ".join(rng.sample(vocab, rng.randint(4, 12))))
            for i in range(80)]
    # plant exact and near duplicates
    docs += [(100, docs[0][1]), (101, docs[1][1] + " extra")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in jaccard_join_prefix(df, "doc_id", "text", n=1,
                                        threshold=0.5).collect()}
    ref = _naive_jaccard_pairs(docs, 0.5)
    assert got == ref                      # complete recall AND precision
    assert (0, 100) in got and got[(0, 100)] == 1.0


def test_prefix_join_threshold_prunes_candidates(spark):
    from niamoto_spark.operators.dedup import jaccard_join_prefix

    docs = [(1, "a b c d e f g h i j"), (2, "a k l m n o p q r s")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    # overlap 1/19 — far below threshold; exact verification kills it
    assert jaccard_join_prefix(df, "doc_id", "text",
                               threshold=0.5).count() == 0


def test_target_encode_loo_hand_computed(spark):
    from niamoto_spark.operators.features import target_encode_loo

    rows = [("a", 1.0), ("a", 0.0), ("a", 1.0), ("b", 0.0), ("b", 0.0),
            ("c", 1.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = target_encode_loo(df, "cat", "y", prior_weight=2.0)
    prior = 3.0 / 6.0
    got = sorted((r.cat, r.y, r.te) for r in out.collect())
    # a rows: (2 - y + 2*0.5)/(3 - 1 + 2)
    assert (("a", 1.0, round((2 - 1 + 1) / 4, 4)) in got)
    assert (("a", 0.0, round((2 - 0 + 1) / 4, 4)) in got)
    # singleton c: (1 - 1 + 1)/(1 - 1 + 2) = 0.5 == prior exactly
    c = [t for t in got if t[0] == "c"][0]
    assert c[2] == pytest.approx(prior)


def test_target_encode_loo_no_self_leakage(spark):
    from niamoto_spark.operators.features import target_encode_loo

    # two rows per category with opposite labels: LOO must yield the
    # OTHER row's (smoothed) label, never its own
    rows = [("g", 1.0, 1), ("g", 0.0, 2)]
    df = spark.createDataFrame(rows, "cat string, y double, rid int")
    out = {r.rid: r.te
           for r in target_encode_loo(df, "cat", "y",
                                      prior_weight=0.0).collect()}
    assert out[1] == 0.0 and out[2] == 1.0


def test_target_encode_null_category_and_target(spark):
    from niamoto_spark.operators.features import target_encode_loo

    rows = [("a", 1.0), ("a", 0.0), (None, 1.0), ("a", None)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = target_encode_loo(df, "cat", "y", prior_weight=1.0)
    prior = 2.0 / 3.0
    rows_out = out.collect()
    null_cat = [r for r in rows_out if r.cat is None][0]
    assert null_cat.te == pytest.approx(round(prior, 4))
    null_y = [r for r in rows_out if r.cat == "a" and r.y is None][0]
    # plain smoothed mean over category a (sum=1, n=2)
    assert null_y.te == pytest.approx(round((1 + prior) / 3, 4))
