"""Empty-input battery: every major operator must return an empty (or
well-defined dense) result on empty input, never crash — the reference
defines an empty-result shape per transformer (FIXTURES.md F7)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from niamoto_spark.operators import aggregation as agg
from niamoto_spark.operators import dedup, extraction, similarity, text


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


@pytest.fixture(scope="module")
def empty_num(spark):
    return spark.createDataFrame([], "g string, v double, m int")


def test_aggregations_on_empty(empty_num):
    assert agg.statistical_summary(empty_num, ["g"], "v").count() == 0
    assert agg.top_ranking(empty_num, ["g"], "v").count() == 0
    assert agg.binary_counter(empty_num, ["g"], "v").count() == 0
    assert agg.time_series_analysis(empty_num, ["g"], "m", ["v"]).count() == 0


def test_dense_frames_on_empty_global(empty_num):
    # global (no group) dense outputs: all bins/categories with 0 counts
    bins = agg.binned_distribution(empty_num, [], "v", [0, 1, 2]).collect()
    assert [r["count"] for r in bins] == [0, 0]
    cats = agg.categorical_distribution(empty_num, [], "v", ["a", "b"]).collect()
    assert [r["count"] for r in cats] == [0, 0]


def test_text_ops_on_empty(empty_docs):
    assert dedup.dedup_exact(empty_docs, "doc_id", "text").count() == 0
    assert dedup.minhash_lsh_candidates(empty_docs, "doc_id", "text",
                                        num_hashes=16, bands=4).count() == 0
    assert dedup.simhash_near_pairs(empty_docs, "doc_id", "text").count() == 0
    assert text.text_quality(empty_docs, "text").count() == 0
    assert text.vocabulary(empty_docs, "text").count() == 0
    assert text.pack_sequences(empty_docs, "doc_id", "text").count() == 0


def test_similarity_on_empty(spark):
    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    assert similarity.cosine_topk(emb, emb, "vec_id", "embedding").count() == 0
    assert similarity.cosine_topk_blas(emb, emb, "vec_id", "embedding").count() == 0
    assert similarity.embedding_near_dup(emb, "vec_id", "embedding").count() == 0


def test_extraction_on_empty(empty_num):
    assert extraction.scatter_analysis(empty_num, "v", "v").count() == 0
    assert extraction.geospatial_extractor(empty_num, ["g"], "v").count() == 0


def test_ivf_kmeans_recall(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(60, 8).astype("float32")
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in base[i]]) for i in range(60)],
        "vec_id bigint, embedding array<float>")
    q = df.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             similarity.cosine_topk(df, q, "vec_id", "embedding", k=3).collect()}
    km = {(r["query_id"], r["neighbor_id"]) for r in
          similarity.ivf_topk(df, q, "vec_id", "embedding", k=3,
                              n_centroids=4, nprobe=2,
                              use_kmeans=True).collect()}
    recall = len(km & exact) / len(exact)
    assert recall >= 0.5  # nprobe=2 of 4 balanced buckets


def test_round3_ops_on_empty(spark):
    from niamoto_spark.operators.overlay import vector_overlay_setop
    from niamoto_spark.operators.utm import polygon_area_utm, simplify_wkt_utm

    empty_shapes = spark.createDataFrame([], "a_id string, geom string")
    empty_zones = spark.createDataFrame([], "b_id string, geom string")
    for op in ("union", "difference", "symmetric_difference", "identity"):
        assert vector_overlay_setop(empty_shapes, "geom", "a_id",
                                    empty_zones, "geom", "b_id",
                                    operation=op).count() == 0
    # layer populated, overlay empty: difference keeps the layer whole
    one = spark.createDataFrame(
        [("a", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")],
        "a_id string, geom string")
    out = vector_overlay_setop(one, "geom", "a_id", empty_zones, "geom",
                               "b_id", operation="difference").collect()
    assert len(out) == 1 and out[0]["part"] == "a_only"
    assert polygon_area_utm(empty_shapes, "geom").count() == 0
    assert simplify_wkt_utm(empty_shapes, "geom").count() == 0


def test_lsh_near_dup_on_empty(spark):
    from niamoto_spark.operators import similarity

    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    assert similarity.embedding_near_dup(emb, "vec_id", "embedding",
                                         method="lsh").count() == 0


def test_round7_operators_on_empty(spark, empty_docs):
    from niamoto_spark.operators.bloomjoin import bloom_semi_join
    from niamoto_spark.operators.extraction import melt
    from niamoto_spark.operators.lm import lm_perplexity_score
    from niamoto_spark.operators.skew import salted_count, salted_join
    from niamoto_spark.operators.text import (dedup_corpus_lines,
                                              epoch_order, shard_corpus)

    assert dedup_corpus_lines(empty_docs, "doc_id", "text").count() == 0
    assert epoch_order(empty_docs, "doc_id").count() == 0
    assert shard_corpus(empty_docs, "doc_id", 4).count() == 0
    assert lm_perplexity_score(empty_docs, "text", "doc_id").count() == 0

    some = spark.range(5).select(F.col("id").alias("k"))
    empty_k = spark.createDataFrame([], "k bigint")
    # empty fact / empty dim both well-defined
    assert salted_join(empty_k, some, "k").count() == 0
    assert salted_join(some, empty_k, "k").count() == 0
    assert salted_count(empty_k, "k").count() == 0
    assert bloom_semi_join(some, empty_k, "k", "k").count() == 0
    assert bloom_semi_join(empty_k, some, "k", "k").count() == 0

    empty_wide = spark.createDataFrame([], "id bigint, a double, b double")
    assert melt(empty_wide, ["id"], ["a", "b"]).count() == 0


def test_round7_sketches_on_empty(spark, empty_docs):
    from niamoto_spark.operators.sketches import (cms_estimate,
                                                  count_min_sketch,
                                                  distinct_sketches,
                                                  heavy_hitters)

    sk = count_min_sketch(empty_docs.select("text"), "text",
                          width=64, depth=2)
    assert cms_estimate(sk, "anything") == 0
    assert heavy_hitters(empty_docs.select("text"), "text", k=4) == []
    assert distinct_sketches(empty_docs, ["doc_id"], "text").count() == 0
