"""Contrastive training-pair mining: positives from near-duplicate
detection, deterministic hash-bucketed negatives.

Embedding/retrieval model training needs (anchor, positive) pairs —
here, near-duplicate documents — and (anchor, negative) pairs that are
(a) NOT near-dups and (b) reproducibly selected.  Random negatives via
rand() differ per run/partitioning; this operator derives them from the
md5 uniform (the engine-independent trick shared with
stratified/weighted sampling), so the exact pair set replays anywhere.

Scale design: negatives come from the anchor's HASH BUCKET — an
equi-join on bucket id, the "in-batch negatives" shape — never from an
all-pairs ranking.  Bucket population is ~N/n_buckets; choose n_buckets
~ N/1000 at corpus scale and each anchor scans a bounded candidate set.
The positive anti-join removes accidental near-dups from the negative
pool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


def _md5_long(col: "F.Column") -> "F.Column":
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


@register("contrastive_pairs", PluginType.TRANSFORMER)
def contrastive_pairs(df: DataFrame, id_col: str, text_col: str,
                      positives: DataFrame,
                      n_negatives: int = 3, n_buckets: int = 32,
                      seed: str = "") -> DataFrame:
    """(anchor_id, other_id, label, score): every positive pair in both
    orientations (label 'pos', score = its similarity column if present)
    plus up to ``n_negatives`` deterministic same-bucket negatives per
    anchor (label 'neg', score null).

    ``positives`` is any (id_a, id_b[, score-like 3rd column]) pair
    frame — minhash, jaccard, embedding near-dup, substring dup.
    """
    score_col = [c for c in positives.columns
                 if c not in ("id_a", "id_b")][:1]
    sc = F.round(F.col(score_col[0]), 4) if score_col \
        else F.lit(None).cast("double")
    pos_fwd = positives.select(F.col("id_a").alias("anchor_id"),
                               F.col("id_b").alias("other_id"),
                               sc.alias("score"))
    pos_rev = positives.select(F.col("id_b").alias("anchor_id"),
                               F.col("id_a").alias("other_id"),
                               sc.alias("score"))
    pos = pos_fwd.unionByName(pos_rev)

    bucket = _md5_long(F.concat(F.col(id_col).cast("string"),
                                F.lit(seed))) % n_buckets
    docs_b = df.select(F.col(id_col).alias("other_id"),
                       bucket.alias("__b"))
    anchors = pos.select("anchor_id").distinct()
    anchors_b = anchors.withColumn(
        "__b", _md5_long(F.concat(F.col("anchor_id").cast("string"),
                                  F.lit(seed))) % n_buckets)

    cand = (anchors_b.join(docs_b, "__b")
            .where(F.col("anchor_id") != F.col("other_id"))
            .join(pos.select("anchor_id", "other_id"),
                  ["anchor_id", "other_id"], "left_anti"))
    pair_h = _md5_long(F.concat(F.col("anchor_id").cast("string"),
                                F.lit("|"),
                                F.col("other_id").cast("string")))
    w = Window.partitionBy("anchor_id").orderBy(pair_h.asc(),
                                                F.col("other_id").asc())
    negs = (cand.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= n_negatives)
            .select("anchor_id", "other_id",
                    F.lit(None).cast("double").alias("score")))

    return (pos.withColumn("label", F.lit("pos"))
            .unionByName(negs.withColumn("label", F.lit("neg")))
            .select("anchor_id", "other_id", "label", "score"))
