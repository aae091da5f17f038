"""End-to-end corpus curation composition."""

import pandas as pd

from niamoto_spark.operators.curation import CurationConfig, curate_corpus

DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4, 5, 6],
    "text": [
        "the quick brown fox jumps over the lazy dog every single day",
        "the quick brown fox jumps over the lazy dog every single day",  # exact dup
        "the quick brown fox jumps over the lazy cat every single day",  # near dup
        "!!! ??? ,,,",                                                   # junk
        "visit https://spam.example.com for more content about engines today friends",
        "an entirely different document about distributed query engines and shuffles",
    ],
})


def test_curation_pipeline_stages(spark):
    docs = spark.createDataFrame(DOCS)
    cfg = CurationConfig(min_quality=0.4, min_tokens=3,
                         near_dup_threshold=0.4, shingle_k=2,
                         minhash_num_hashes=64, minhash_bands=16, seq_len=8)
    curated, stats = curate_corpus(docs, "doc_id", "text", cfg)
    s = {r["stage"]: (r["docs_in"], r["docs_out"]) for r in stats.collect()}
    assert s["quality"][1] == 5              # junk doc dropped
    assert s["exact_dedup"][1] == 4          # one of 1/2 dropped
    assert s["near_dedup"][1] == 3           # 3 near-dups 1 cluster -> 1 kept
    rows = curated.collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert 4 not in ids and len(ids) == 3
    got = {r["doc_id"]: r for r in rows}
    assert "<URL>" in got[5]["text_scrubbed"]          # scrubbed
    assert all(r["pack_first"] is not None for r in rows)  # packed


def test_curation_stage_subset(spark):
    docs = spark.createDataFrame(DOCS)
    curated, stats = curate_corpus(
        docs, "doc_id", "text",
        CurationConfig(stages=["exact_dedup"]))
    assert [r["stage"] for r in stats.collect()] == ["exact_dedup"]
    assert curated.count() == 5


def test_curation_repetition_and_decontaminate_stages(spark):
    import pandas as pd

    from niamoto_spark.operators.curation import CurationConfig, curate_corpus

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["useful clean document with plenty of varied words inside",
                 "spam spam spam spam spam spam spam spam spam spam",
                 "the secret benchmark answer is forty two exactly here"]}))
    bench = spark.createDataFrame(pd.DataFrame(
        {"text": ["the secret benchmark answer is forty two"]}))
    cfg = CurationConfig(
        stages=["repetition", "decontaminate"],
        # 9-token docs with all-unique bigrams score 2/9 ~ 0.22, so the
        # production 0.2 default would drop them; 0.3 isolates the spam doc
        max_top_bigram_frac=0.3,
        benchmark_df=bench, decontaminate_ngram=5)
    kept, stats = curate_corpus(docs, "doc_id", "text", cfg)
    assert {r["doc_id"] for r in kept.collect()} == {1}
    st = {r["stage"]: (r["docs_in"], r["docs_out"]) for r in stats.collect()}
    assert st["repetition"] == (3, 2)       # spam doc dropped
    assert st["decontaminate"] == (2, 1)    # benchmark doc dropped
