"""Product quantization: centroid fixed points, deterministic codes,
ADC recall vs brute-force cosine on a clustered corpus, and error guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from niamoto_spark.operators.quantization import (pq_encode, pq_topk,
                                                  pq_train, _split)


def _clustered(n=400, d=32, n_clusters=8, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 5.0
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign] + rng.normal(size=(n, d)) * 0.3
    return x, assign


@pytest.fixture(scope="module")
def corpus(spark):
    x, _ = _clustered()
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_split_guard():
    assert _split(32, 4) == [(0, 8), (8, 16), (16, 24), (24, 32)]
    with pytest.raises(ValueError, match="divisible"):
        _split(30, 4)


def test_centroid_vectors_encode_to_themselves(spark, corpus):
    books = pq_train(corpus, "embedding", m=4, ksub=8)
    # a vector stitched from centroid j of every subspace must code to j
    probe = [(999, [v for b in books for v in b[3]])]
    pdf = spark.createDataFrame(probe, "vec_id bigint, embedding array<double>")
    row = pq_encode(pdf, "vec_id", "embedding", books).first()
    assert row["codes"] == [3, 3, 3, 3]


def test_codes_deterministic_across_partitioning(corpus):
    books = pq_train(corpus, "embedding", m=4, ksub=8)
    a = {r["vec_id"]: r["codes"] for r in
         pq_encode(corpus, "vec_id", "embedding", books).collect()}
    b = {r["vec_id"]: r["codes"] for r in
         pq_encode(corpus.repartition(13), "vec_id", "embedding",
                   books).collect()}
    assert a == b


def test_adc_cluster_recall(spark, corpus):
    """Coarse PQ (4x8) cannot rank WITHIN a tight cluster (same-code ties),
    but retrieved neighbors must come from the query's true cluster:
    cluster-recall@5 >= 0.9."""
    books = pq_train(corpus, "embedding", m=4, ksub=8)
    codes = pq_encode(corpus, "vec_id", "embedding", books)
    queries = corpus.where(F.col("vec_id") < 20)
    got = pq_topk(codes, queries, "vec_id", "embedding", books, k=6)
    approx = {}
    for r in got.collect():
        if r["query_id"] != r["neighbor_id"]:
            approx.setdefault(r["query_id"], []).append(r["neighbor_id"])

    _, assign = _clustered()
    hits = total = 0
    for q in range(20):
        for nb in approx[q][:5]:
            hits += int(assign[nb] == assign[q])
            total += 1
    assert hits / total >= 0.9, f"cluster-recall@5 {hits/total:.2f}"


def test_adc_exact_when_codebook_saturates(spark):
    """ksub == n makes every point its own centroid: encoding is lossless
    and ADC == exact squared L2, so top-k must equal brute force."""
    rng = np.random.default_rng(9)
    x = rng.normal(size=(48, 8))
    rows = [(i, [float(v) for v in x[i]]) for i in range(48)]
    spark_df = spark.createDataFrame(rows,
                                     "vec_id bigint, embedding array<double>")
    books = pq_train(spark_df, "embedding", m=2, ksub=48)
    codes = pq_encode(spark_df, "vec_id", "embedding", books)
    queries = spark_df.where(F.col("vec_id") < 5)
    got = {}
    for r in pq_topk(codes, queries, "vec_id", "embedding", books,
                     k=4, round_dp=9).collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for q in range(5):
        d = ((x - x[q]) ** 2).sum(axis=1)
        want = list(np.argsort(d)[:4])      # self included at dist 0
        assert got[q] == want, (q, got[q], want)


def test_empty_queries(spark, corpus):
    books = pq_train(corpus, "embedding", m=4, ksub=8)
    codes = pq_encode(corpus, "vec_id", "embedding", books)
    empty = corpus.where(F.lit(False))
    assert pq_topk(codes, empty, "vec_id", "embedding", books).count() == 0


def test_train_sample_guard(spark):
    rows = [(i, [float(i), 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="sample"):
        pq_train(df, "embedding", m=2, ksub=8)


def test_ivfpq_recall_vs_full_scan(spark, sf_dir):
    """The composite IVF-PQ index must recover most of the FULL-SCAN ADC
    ranking (same codebooks) — only the coarse quantizer's pruning may
    cost recall, and L2 assignment + replication=2 keeps it high."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from niamoto_spark.operators.quantization import (ivfpq_topk,
                                                      pq_encode, pq_train,
                                                      pq_topk)

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    books = pq_train(emb, "embedding", m=8, ksub=8)
    queries = emb.where(F.col("vec_id") < 10)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    full = (pq_topk(pq_encode(emb, "vec_id", "embedding", books),
                    queries, "vec_id", "embedding", books, k=6)
            .where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= 5).select("query_id", "neighbor_id"))
    comp = ivfpq_topk(emb, queries, "vec_id", "embedding", books, k=5,
                      n_centroids=4, nprobe=3, replication=2) \
        .select("query_id", "neighbor_id")
    hits = full.join(comp, ["query_id", "neighbor_id"], "left_semi").count()
    assert hits / full.count() >= 0.7


def test_ivfpq_no_self_matches_and_ranked(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from niamoto_spark.operators.quantization import ivfpq_topk, pq_train

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    books = pq_train(emb, "embedding", m=4, ksub=8)
    out = ivfpq_topk(emb, emb.where(F.col("vec_id") < 3), "vec_id",
                     "embedding", books, k=4, n_centroids=4, nprobe=2)
    rows = out.collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        dists = [r["adc_dist"] for r in rs]
        assert dists == sorted(dists)
