"""Record linkage / entity resolution: blocked fuzzy-string matching.

The reference matches taxonomy names exactly (SmartMatcher,
core/imports and matching.py's structural tiers); real-world entity
resolution needs APPROXIMATE matching — same person/taxon/organization
spelled slightly differently.  This operator adds the standard two-stage
shape:

1. BLOCKING: candidate pairs only within a block key (nation, soundex,
   zip, first-k chars ...).  Without it the pair space is n² — the block
   join restores an equi-key so Spark shuffles on block and each block
   contributes |block|² locally.  ``max_block_size`` drops degenerate
   blocks (the hot-bucket policy every pair generator in this repo
   uses).
2. SCORING: JVM-side ``levenshtein`` (built-in, codegen) under a
   threshold, plus a normalized similarity for downstream ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("fuzzy_pairs", PluginType.TRANSFORMER)
def fuzzy_pairs(df: DataFrame, id_col: str, name_col: str, block_col: str,
                max_edit_distance: int = 2,
                max_block_size: int | None = 10_000,
                round_dp: int = 4) -> DataFrame:
    """Within-block record pairs with edit distance <= threshold.

    Output: (id_a, id_b, edit_distance, name_sim) with id_a < id_b;
    name_sim = 1 - dist / max(len_a, len_b).
    """
    base = df.select(F.col(id_col).alias("rid"),
                     F.col(name_col).alias("name"),
                     F.col(block_col).alias("block"))
    if max_block_size is not None:
        sizes = base.groupBy("block").agg(F.count(F.lit(1)).alias("__n"))
        ok = sizes.where(F.col("__n") <= max_block_size).select("block")
        base = base.join(F.broadcast(ok), "block", "left_semi")
    left = base.select(F.col("rid").alias("id_a"),
                       F.col("name").alias("name_a"), "block")
    right = base.select(F.col("rid").alias("id_b"),
                        F.col("name").alias("name_b"), "block")
    dist = F.levenshtein("name_a", "name_b")
    sim = F.lit(1.0) - dist / F.greatest(F.length("name_a"),
                                         F.length("name_b"))
    return (left.join(right, "block")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("edit_distance", dist)
            .where(F.col("edit_distance") <= max_edit_distance)
            .select("id_a", "id_b", "edit_distance",
                    F.round(sim, round_dp).alias("name_sim")))


def fuzzy_dedup_keep(df: DataFrame, id_col: str, name_col: str,
                     block_col: str, **kwargs) -> DataFrame:
    """Record set with fuzzy duplicates removed (min-id keeper per
    matched pair — compose with components.dedup_keep_components for
    cluster-exact semantics)."""
    pairs = fuzzy_pairs(df, id_col, name_col, block_col, **kwargs)
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")
