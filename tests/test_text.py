"""Text-analysis operators: tokenization edges, quality signals, lang id."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from niamoto_spark.functions import char_ngrams, token_count, word_shingles
from niamoto_spark.operators import text as tx


def test_token_count_edges(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"t": ["one two three", "  padded  ", "", "   ", "single"]}))
    out = [r["n"] for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert out == [3, 1, 0, 0, 1]


def test_char_ngrams(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["abcd", "ab", ""]}))
    out = [r["g"] for r in df.select(char_ngrams(F.col("t"), 3).alias("g")).collect()]
    assert out == [["abc", "bcd"], [], []]


def test_word_shingles(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["a b c d"]}))
    out = df.select(word_shingles(F.col("t"), 2).alias("s")).collect()[0]["s"]
    assert out == ["a b", "b c", "c d"]


def test_text_quality_signals(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"text": ["A clean simple sentence with normal words here.",
                  "!!! ??? ... ,,, ;;; :::",
                  ""]}))
    rows = tx.text_quality(df, "text").collect()
    good, junk, empty = rows
    assert good["quality_score"] > junk["quality_score"]
    assert junk["punct_ratio"] > 0.5
    assert empty["n_tokens"] == 0 and empty["quality_score"] == 0.0
    assert 0 <= good["alpha_ratio"] <= 1


def test_bpe_estimate_scales_with_length(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"text": ["hi", "internationalization considerations", ""]}))
    out = [r["bpe_tokens_est"] for r in
           tx.bpe_token_estimate(df, "text").collect()]
    assert out[0] == 1
    assert out[1] >= 9   # two long words -> multiple subword units
    assert out[2] == 0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": [
        "the cat and the dog sat in the garden of the house",
        "le chat et la maison de la ville et le jardin",
        "el perro y los gatos en las casas y el parque",
        "der hund und die katze und das haus nicht hier",
        "zzz qqq xxx www",
    ]}))
    out = [r["lang_pred"] for r in tx.lang_id(df, "text").collect()]
    assert out == ["en", "fr", "es", "de", "und"]


def test_doc_fingerprint_normalizes_whitespace_case(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"text": ["Hello   World", "hello world", "different"]}))
    fps = [r["fingerprint"] for r in tx.doc_fingerprint(df, "text").collect()]
    assert fps[0] == fps[1] != fps[2]


def test_token_stats_grouped(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"lang": ["en", "en", "fr"], "text": ["a b", "c d e", "f"]}))
    out = {r["lang"]: r for r in tx.token_stats(df, ["lang"], "text").collect()}
    assert out["en"]["total_tokens"] == 5
    assert out["en"]["avg_tokens"] == 2.5
    assert out["fr"]["n_docs"] == 1


def test_pack_sequences(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c", "d e f g", "h i"]}))  # 3, 4, 2 tokens
    rows = {r["doc_id"]: r for r in
            tx.pack_sequences(df, "doc_id", "text", seq_len=4).collect()}
    # layout: [a b c | d][e f g h?] -> doc1 offsets 0-2 pack0; doc2 offset 3
    # spans packs 0-1; doc3 offset 7 pack1
    assert (rows[1]["offset"], rows[1]["pack_first"], rows[1]["pack_last"]) == (0, 0, 0)
    assert (rows[2]["offset"], rows[2]["pack_first"], rows[2]["pack_last"]) == (3, 0, 1)
    assert (rows[3]["offset"], rows[3]["pack_first"], rows[3]["pack_last"]) == (7, 1, 2)


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox jumps over the lazy dog tonight",
                 "a completely unrelated piece of text here",
                 "we saw the quick brown fox jumps over the fence"]}))
    bench = spark.createDataFrame(pd.DataFrame(
        {"text": ["witnesses said the quick brown fox jumps over things"]}))
    hit = {r["doc_id"]: r["n_hits"] for r in
           tx.decontaminate(docs, "doc_id", "text", bench, "text",
                              ngram=5).collect()}
    assert 1 in hit and 3 in hit and 2 not in hit
    kept = tx.decontaminate_keep(docs, "doc_id", "text", bench, "text",
                                   ngram=5)
    assert {r["doc_id"] for r in kept.collect()} == {2}


def test_repetition_stats_goldens(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["buy now\nbuy now\nbuy now\nlimited offer",     # 3/4 dup lines
                 "alpha beta\n\ngamma delta",                     # clean
                 "spam spam spam spam spam spam"]}))              # 1 bigram
    rows = {r["doc_id"]: r for r in
            tx.repetition_stats(docs, "text", id_col="doc_id").collect()}
    assert rows[1]["dup_line_frac"] == pytest.approx(0.5)     # 4 lines, 2 distinct
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[2]["dup_para_frac"] == 0.0
    # "spam spam" appears 5 times among 6 tokens -> 5*2/6
    assert rows[3]["top_bigram_frac"] == pytest.approx(round(10 / 6, 4))
    assert rows[1]["top_bigram_frac"] == pytest.approx(round(3 * 2 / 8, 4))


def test_stratified_sample_deterministic_and_rate(spark):
    import hashlib

    pdf = pd.DataFrame({"doc_id": range(2000),
                        "src": ["web"] * 1000 + ["books"] * 1000})
    df = spark.createDataFrame(pdf)
    out = tx.stratified_sample(df, "doc_id", "src",
                                 {"web": 0.3, "books": 1.0})
    got = out.groupBy("src").count().collect()
    counts = {r["src"]: r["count"] for r in got}
    assert counts["books"] == 1000                  # rate 1.0 keeps all
    assert 230 <= counts["web"] <= 370              # ~30% of 1000
    # engine-independent selection: replicate with hashlib
    expect_web = sum(
        1 for i in range(1000)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        < 0.3 * 2 ** 32)
    assert counts["web"] == expect_web
    # rerun -> identical selection
    again = tx.stratified_sample(df, "doc_id", "src",
                                   {"web": 0.3, "books": 1.0})
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_chunk_documents_overlap_and_edges(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [" ".join(f"w{i}" for i in range(10)),   # 10 tokens
                 "short one",                            # fits one chunk
                 ""]}))                                  # empty -> no chunks
    out = tx.chunk_documents(docs, "doc_id", "text",
                             chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # step 3: 1 + ceil((10-4)/3) = 3 chunks at starts 0,3,6 — all 10
    # tokens covered, no degenerate tail chunk
    assert [r["chunk_text"] for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 4]
    # consecutive chunks share the overlap token
    assert c1[0]["chunk_text"].split()[-1] == c1[1]["chunk_text"].split()[0]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short one"
    assert 3 not in by_doc


def test_char_entropy_signals(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["aaaaaaaa",                  # 0 bits
                 "abababab",                  # exactly 1 bit
                 "the quick brown fox"]}))    # natural-ish, higher
    rows = {r["doc_id"]: r["char_entropy"] for r in
            tx.char_entropy(docs, "doc_id", "text").collect()}
    assert rows[1] == 0.0
    assert rows[2] == pytest.approx(1.0)
    assert rows[3] > 3.0


def test_decontaminate_hash_grams_matches_textual(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox jumps over the lazy dog tonight",
                 "a completely unrelated piece of text here",
                 "we saw the quick brown fox jumps over the fence"]}))
    bench = spark.createDataFrame(pd.DataFrame(
        {"text": ["witnesses said the quick brown fox jumps over things"]}))
    textual = {(r["doc_id"], r["n_hits"]) for r in
               tx.decontaminate(docs, "doc_id", "text", bench, "text",
                                ngram=5).collect()}
    hashed = {(r["doc_id"], r["n_hits"]) for r in
              tx.decontaminate(docs, "doc_id", "text", bench, "text",
                               ngram=5, hash_grams=True).collect()}
    assert hashed == textual


def test_scrub_ip_and_phone(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "text": ["server at 192.168.1.10 responded",
                 "call +687 123 456 or +33-6-12-34-56-78",
                 "version 1.2.3 is not an ip, nor is +12"]}))
    rows = tx.scrub_text(docs, "text").collect()
    assert rows[0]["n_ips"] == 1
    assert "<IP>" in rows[0]["text_scrubbed"]
    assert rows[1]["n_phones"] == 2
    assert rows[1]["text_scrubbed"].count("<PHONE>") == 2
    assert rows[2]["n_ips"] == 0 and rows[2]["n_phones"] == 0
    assert rows[2]["text_scrubbed"] == "version 1.2.3 is not an ip, nor is +12"


def test_materialize_packs_layout(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c", "d e f g", "h i"]}))   # 3+4+2 = 9 tokens
    rows = {r["pack_id"]: r for r in
            tx.materialize_packs(docs, "doc_id", "text",
                                 seq_len=4, vocab_size=100).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["n_tokens"] == 4 and rows[1]["n_tokens"] == 4
    assert rows[2]["n_tokens"] == 1
    # pack 0 holds doc1 (3 tokens) + first token of doc2
    assert rows[0]["n_docs"] == 2
    # total token multiset preserved across packs
    assert sum(r["n_tokens"] for r in rows.values()) == 9
    import hashlib

    def tid(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 100

    assert rows[0]["token_ids"] == [tid(t) for t in ["a", "b", "c", "d"]]
    assert rows[1]["token_ids"] == [tid(t) for t in ["e", "f", "g", "h"]]
    assert rows[2]["token_ids"] == [tid("i")]


def test_lang_id_extended_languages(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": [
        "il governo che parla della situazione dei cittadini sono qui",
        "het is een mooie dag maar niet voor iedereen zijn er kansen",
        "os resultados para uma cidade com mais pessoas",
    ]}))
    out = [r["lang_pred"] for r in tx.lang_id(df, "text").collect()]
    assert out == ["it", "nl", "pt"]


def test_lang_id_accented_markers_still_count(spark):
    """Review r3: marker words with non-ASCII chars would be fragmented by
    the \\W+ tokenizer — they must fall back to boundary-regexp counting."""
    import pandas as pd

    from niamoto_spark.operators.text import lang_id

    df = spark.createDataFrame(pd.DataFrame({
        "text": ["não vale a pena", "the cat sat"]}))
    out = [r["lang_pred"] for r in lang_id(
        df, "text",
        markers={"pt": ("não", "pena"), "en": ("the", "cat")}).collect()]
    assert out == ["pt", "en"]


def test_unigram_logprob_score_orders_fluency(spark):
    """Docs made of corpus-frequent tokens must outscore rare-token soup;
    empty docs yield NULL score with 0 tokens."""
    import pandas as pd

    from niamoto_spark.operators.text import unigram_logprob_score

    rows = [(1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (3, "zxqv jkwp qqpl mmzx"),      # rare-token soup
            (4, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in
           unigram_logprob_score(df, "doc_id", "text").collect()}
    assert got[1]["mean_logprob"] > got[3]["mean_logprob"]
    assert got[2]["mean_logprob"] > got[3]["mean_logprob"]
    assert got[4]["mean_logprob"] is None and got[4]["n_tokens"] == 0
    assert got[1]["n_tokens"] == 6


def test_temperature_sample_rates_and_determinism(spark):
    """alpha=1 keeps everything; alpha=0 equalizes expected domain counts
    (rate = n_min/n_d); selection is identical across repartitionings."""
    import pandas as pd

    from niamoto_spark.operators.text import temperature_sample

    rows = [(i, "big" if i < 800 else "small") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id bigint, dom string")

    assert temperature_sample(df, "doc_id", "dom", alpha=1.0).count() == 900

    flat = temperature_sample(df, "doc_id", "dom", alpha=0.0)
    by_dom = {r["dom"]: r["n"] for r in
              flat.groupBy("dom").agg(__import__("pyspark").sql.functions
                                      .count("*").alias("n")).collect()}
    assert by_dom["small"] == 100                  # smallest keeps all
    assert abs(by_dom["big"] - 100) < 40           # ~n_min in expectation

    half = temperature_sample(df, "doc_id", "dom", alpha=0.5)
    ids1 = {r["doc_id"] for r in half.collect()}
    ids2 = {r["doc_id"] for r in
            temperature_sample(df.repartition(7), "doc_id", "dom",
                               alpha=0.5).collect()}
    assert ids1 == ids2

    import pytest as _pt
    with _pt.raises(ValueError, match="alpha"):
        temperature_sample(df, "doc_id", "dom", alpha=1.5)


def test_epoch_order_is_complete_permutation(spark):
    from niamoto_spark.operators.text import epoch_order

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = epoch_order(df, "doc_id", seed=3)
    positions = sorted(r["pos"] for r in out.collect())
    assert positions == list(range(1000))


def test_epoch_order_partitioning_invariant(spark):
    from niamoto_spark.operators.text import epoch_order

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["pos"]
         for r in epoch_order(df.coalesce(1), "doc_id", seed=9,
                              num_partitions=3).collect()}
    b = {r["doc_id"]: r["pos"]
         for r in epoch_order(df.repartition(11), "doc_id", seed=9,
                              num_partitions=7).collect()}
    assert a == b


def test_epoch_order_seed_changes_permutation(spark):
    from niamoto_spark.operators.text import epoch_order

    df = spark.range(300).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["pos"]
         for r in epoch_order(df, "doc_id", seed=0).collect()}
    b = {r["doc_id"]: r["pos"]
         for r in epoch_order(df, "doc_id", seed=1).collect()}
    assert a != b
    assert sorted(a.values()) == sorted(b.values())


def test_epoch_order_no_global_window(spark):
    """The plan must not contain a partition-less Window (the
    single-reducer global sort trap)."""
    from niamoto_spark.operators.text import epoch_order

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = epoch_order(df, "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start():m.start() + 300]
        assert "__pid" in seg  # every window is partition-local
