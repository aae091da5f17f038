"""BPE trainer: the Sennrich textbook example, incremental-update
equivalence, encode round-trips, and memoized distributed encoding."""

import pytest
from pyspark.sql import functions as F

from niamoto_spark.operators.bpe import (END, _encode_word, bpe_encode,
                                         bpe_pair_counts, bpe_train,
                                         bpe_word_counts,
                                         initial_segmentation)

# 'low'*5 'lower'*2 'newest'*6 'widest'*3 — the original BPE paper corpus
CORPUS = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                  + ["widest"] * 3)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(0, CORPUS)], "doc_id bigint, text string")


def test_pair_counts_hand_computed(docs):
    pc = {(r["sym_a"], r["sym_b"]): r["pair_n"] for r in
          bpe_pair_counts(initial_segmentation(
              bpe_word_counts(docs, "text"))).collect()}
    assert pc[("e", "s")] == 9          # newest(6) + widest(3)
    assert pc[("s", "t")] == 9
    assert pc[("t", END)] == 9
    assert pc[("l", "o")] == 7          # low(5) + lower(2)
    assert pc[("w", END)] == 5          # low</w> only


def test_train_sennrich_merges(docs):
    merges = bpe_train(docs, "text", num_merges=5, min_count=1)
    # count ties broken lexicographically: (e,s)=(s,t)=(t,</w>)=9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")
    assert merges[4] == ("lo", "w")


def test_train_min_count_stops(docs):
    merges = bpe_train(docs, "text", num_merges=100, min_count=8)
    assert all(m in [("e", "s"), ("es", "t"), ("est", END)] for m in merges)
    assert len(merges) == 3


def test_encode_word_greedy_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", END), ("l", "o"),
              ("lo", "w"), ("n", "e"), ("ne", "w"), ("new", "est</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("newest", ranks) == ["newest</w>"]
    assert _encode_word("widest", ranks) == ["w", "i", "d", "est</w>"]
    assert _encode_word("low", ranks) == ["low", END]


def test_encode_roundtrip_and_counts(spark, docs):
    merges = bpe_train(docs, "text", num_merges=8, min_count=1)
    extra = spark.createDataFrame(
        [(1, "the lowest newest zq"), (2, "")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           bpe_encode(extra, "doc_id", "text", merges).collect()}
    r1 = out[1]
    assert r1["n_words"] == 4
    assert r1["n_bpe_tokens"] == len(r1["tokens"])
    # concatenating tokens and stripping </w> reproduces the words
    joined = "".join(r1["tokens"]).replace(END, " ").strip()
    assert joined == "the lowest newest zq"
    assert out[2]["n_words"] == 0 and out[2]["tokens"] == []


def test_encode_deterministic_across_partitioning(spark, docs):
    merges = bpe_train(docs, "text", num_merges=8, min_count=1)
    many = spark.createDataFrame(
        [(i, f"low lower newest doc{i}") for i in range(40)],
        "doc_id bigint, text string")
    a = {r["doc_id"]: r["tokens"] for r in
         bpe_encode(many, "doc_id", "text", merges).collect()}
    b = {r["doc_id"]: r["tokens"] for r in
         bpe_encode(many.repartition(7), "doc_id", "text", merges).collect()}
    assert a == b


def test_hash_spam_vocab_is_capped(spark):
    """Adversarial corpus where distinct "words" scale with corpus size
    (hashes/UUIDs/base64): max_vocab bounds the driver collect to the
    top-k words regardless, and the real high-frequency words survive
    the (n desc, word asc) cap so merges are still learned."""
    spam = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("low lower newest junk"),
                 F.md5(F.col("id").cast("string"))).alias("text"))
    # the capped word-count frame is what bpe_train collects
    capped = bpe_word_counts(spam, "text", max_vocab=100)
    assert capped.count() == 100
    top = capped.orderBy(F.desc("n"), "word").limit(3).collect()
    assert {r["word"] for r in top} == {"low", "lower", "newest"}
    merges = bpe_train(spam, "text", num_merges=4, min_count=2,
                       max_vocab=100)
    assert ("l", "o") in merges          # low/lower still dominate


def test_min_word_count_prunes_executor_side(spark):
    """min_word_count drops rare words inside the aggregation job —
    singleton junk never reaches the driver."""
    df = spark.createDataFrame(
        [(0, "low low low uniquejunktoken")], "doc_id bigint, text string")
    wc = {r["word"]: r["n"]
          for r in bpe_word_counts(df, "text", min_word_count=2).collect()}
    assert wc == {"low": 3}


def test_default_train_unchanged_by_guards(spark, docs):
    """The 10M default cap is far above any test corpus: the Sennrich
    merges are byte-identical with and without explicit guards."""
    a = bpe_train(docs, "text", num_merges=5, min_count=1)
    b = bpe_train(docs, "text", num_merges=5, min_count=1,
                  max_vocab=1000)
    assert a == b
