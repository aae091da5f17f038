"""Web-corpus curation walkthrough: the round-8 web lane end-to-end.

Plays the pipeline a pretraining-data team runs over a crawl slice,
the way lakehouse_demo.py plays a platform team's day:

  1. synthesize messy crawl URLs (tracking params, www/port/fragment
     noise) and canonicalize them (url_normalize)
  2. URL-level dedup: campaign-tagged refetches of the same page
     collapse to one canonical row per url_norm
  3. measure the mix per registrable domain (domain_mix)
  4. language-aware rebalance to a target mixture under a row budget
     (mixture_rebalance — deterministic md5 selection)
  5. quality-score + exact-dedup the selected docs (text lane)
  6. hashing-trick featurization for a downstream filter model
     (hashed_features)
  7. temporal split with an embargo — here by doc_id as pseudo-time —
     and a leakage audit between train and test (leakage_audit)
  8. shard the survivors for the trainer (shard_corpus)

Run:  python examples/web_corpus_demo.py [sf_dir] [work_dir]
Defaults: /root/testdata/sf0.001  /tmp/niamoto_web_demo
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(sf_dir: str, work_dir: str, spark=None) -> dict:
    from niamoto_spark.operators.curation import mixture_rebalance
    from niamoto_spark.operators.dedup import dedup_exact_keep
    from niamoto_spark.operators.text import (hashed_features,
                                              shard_corpus, text_quality)
    from niamoto_spark.operators.web import domain_mix, url_normalize
    from niamoto_spark.session import get_spark

    spark = spark or get_spark("web_corpus_demo")
    report: dict = {}

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1-2. messy URLs -> canonical; two campaign variants per doc must
    # collapse to ONE canonical URL each
    with_urls = docs.withColumn(
        "url",
        F.concat(F.lit("HTTPS://WWW."), F.col("source"),
                 F.lit("-cdn.NET:443/"), F.col("lang"), F.lit("/"),
                 F.col("doc_id"),
                 F.lit("/?utm_source=feed&ref=rss&page=1#top")))
    variant = with_urls.withColumn(
        "url", F.regexp_replace("url", r"utm_source=feed",
                                "utm_source=mail"))
    crawl = with_urls.unionByName(variant)
    normed = url_normalize(crawl, "url")
    report["crawl_rows"] = crawl.count()
    canon = normed.dropDuplicates(["url_norm"])
    report["after_url_dedup"] = canon.count()

    # 3. domain mix
    mix = domain_mix(canon, "url")
    report["n_domains"] = mix.count()

    # 4. rebalance to a target language mixture
    langs = [r["lang"] for r in canon.select("lang").distinct().collect()]
    share = 1.0 / len(langs)
    budget = max(10, int(report["after_url_dedup"] * 0.6))
    selected, summary = mixture_rebalance(
        canon, "doc_id", "lang", {lg: share for lg in langs}, budget)
    report["rebalance_summary"] = {
        r["lang"]: (r["n_avail"], r["n_selected"])
        for r in summary.collect()}
    report["selected"] = selected.count()

    # 5. quality + exact dedup
    scored = text_quality(selected, "text")
    kept = scored.where(F.col("quality_score") >= 0.2)
    deduped = dedup_exact_keep(kept, "doc_id", "text")
    report["after_quality_dedup"] = deduped.count()

    # 6. hashing-trick features for a fasttext-ish filter model
    feats = hashed_features(deduped, "doc_id", "text", dim=64)
    report["feature_rows"] = feats.count()

    # 7. pseudo-temporal split (doc_id as ingest order) + embargo
    from niamoto_spark.operators.curation import temporal_split
    split = temporal_split(deduped.withColumn(
        "t", F.col("doc_id").cast("double")), "t",
        test_frac=0.2, embargo_s=5.0)
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    report["split_counts"] = counts
    tr_max = (split.where(F.col("split") == "train")
              .agg(F.max("doc_id")).first()[0])
    te_min = (split.where(F.col("split") == "test")
              .agg(F.min("doc_id")).first()[0])
    report["no_time_leak"] = (tr_max is None or te_min is None
                              or tr_max < te_min)

    # 8. shard for the trainer
    sharded = shard_corpus(split.where(F.col("split") == "train"),
                           "doc_id", n_shards=4)
    report["train_shards"] = (sharded.select("shard").distinct().count())
    out = os.path.join(work_dir, "train")
    (sharded.select("doc_id", "text", "shard")
     .write.mode("overwrite").partitionBy("shard").parquet(out))
    report["written"] = spark.read.parquet(out).count()
    return report


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wd = sys.argv[2] if len(sys.argv) > 2 else "/tmp/niamoto_web_demo"
    out = run(sf, wd)
    for k, v in out.items():
        print(f"{k}: {v}")
