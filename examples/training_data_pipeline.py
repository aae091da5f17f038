"""End-to-end training-data curation pipeline on the extension lane.

Composes the engine's corpus operators the way a pretraining-data team
would chain them, on the synthetic documents table:

  raw corpus
    -> exact dedup                 (dedup_exact_keep)
    -> corpus-wide line dedup      (dedup_corpus_lines: boilerplate strip)
    -> bigram-LM fluency scores    (lm_perplexity_score)
    -> quality classifier          (train/score_text_classifier)
    -> leakage-safe grouped split  (split_assign_grouped: by source)
    -> committed, constraint-checked manifest table (append_checked)
    -> JSONL shards per split      (export_jsonl_shards)

Run:  python examples/training_data_pipeline.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001  /tmp/niamoto_training_data
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(sf_dir: str, out_dir: str, spark=None) -> dict:
    from niamoto_spark.exporters.jsonl import export_jsonl_shards
    from niamoto_spark.operators.classifier import (score_text_classifier,
                                                    train_text_classifier)
    from niamoto_spark.operators.dedup import dedup_exact_keep
    from niamoto_spark.operators.lm import lm_perplexity_score
    from niamoto_spark.operators.text import (dedup_corpus_lines,
                                              split_assign_grouped)
    from niamoto_spark.session import get_spark
    from niamoto_spark.sources import manifest as M

    spark = spark or get_spark("training_data_pipeline")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    stats: dict = {}

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    stats["raw"] = docs.count()

    # 1. exact dedup (normalized text hash, keep min id)
    docs = dedup_exact_keep(docs, "doc_id", "text")
    stats["after_exact_dedup"] = docs.count()

    # 2. corpus-wide duplicate-line removal (C4 boilerplate strip)
    deduped = dedup_corpus_lines(docs, "doc_id", "text")
    docs = (docs.drop("text", "n_chars")
            .join(deduped.select("doc_id", "text"), "doc_id"))
    stats["after_line_dedup"] = docs.count()

    # 3. bigram-LM fluency (self-fit); keep everything, carry the score
    lm = lm_perplexity_score(docs, "text", "doc_id")
    docs = docs.join(lm.select("doc_id", "avg_logprob"), "doc_id")

    # 4. quality classifier (label: English) — score as a feature
    labeled = docs.withColumn("y", (F.col("lang") == "en").cast("int"))
    w, b = train_text_classifier(labeled, "doc_id", "text", "y",
                                 n_buckets=512, iters=3)
    scored = score_text_classifier(docs, "doc_id", "text", w, b,
                                   n_buckets=512, out_col="p_en")
    docs = docs.join(scored, "doc_id")

    # 5. leakage-safe split by source domain
    docs = split_assign_grouped(docs, "source",
                                {"train": 0.8, "val": 0.1, "test": 0.1})
    stats["splits"] = {r["split"]: r["n"] for r in
                       docs.groupBy("split").agg(
                           F.count(F.lit(1)).alias("n")).collect()}

    # 6. commit the curated corpus (contract-checked)
    table = os.path.join(out_dir, "curated")
    M.append_checked(docs, table, [
        {"rule": "not_null", "col": "doc_id"},
        {"rule": "unique", "cols": ["doc_id"]},
        {"rule": "accepted_values", "col": "split",
         "values": ["train", "val", "test"]},
    ])
    stats["table_version"] = M.current_version(table)

    # 7. JSONL shards per split (the loader-facing layout)
    for split in ("train", "val", "test"):
        export_jsonl_shards(
            docs.where(F.col("split") == split),
            "doc_id", os.path.join(out_dir, f"jsonl/{split}"), n_shards=4)
    stats["out_dir"] = out_dir
    return stats


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/niamoto_training_data"
    print(run(sf, out))
