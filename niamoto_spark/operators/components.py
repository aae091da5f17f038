"""Connected components over candidate-pair edges.

Near-duplicate pairs (minhash / simhash / embedding) form clusters, not just
pairs; keeping one representative per CLUSTER requires connected components,
not the greedy drop-the-higher-id pass (which can drop a doc whose only link
was itself dropped).

Implementation: iterative label propagation to fixpoint — each node adopts
the minimum label in its neighborhood; converges in O(cluster diameter)
rounds, each round one join + one aggregate.  Dup clusters are tiny (near
-identical docs), so 3-5 rounds cover real corpora; the bound is explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("connected_components", PluginType.TRANSFORMER)
def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iterations: int = 10) -> DataFrame:
    """(node_id, component_id) for every node in the edge list; component_id
    = min node id in the component."""
    edges = (pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
             .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
             .distinct())
    labels = (edges.select(F.col("a").alias("node_id"))
              .distinct()
              .withColumn("component_id", F.col("node_id")))
    for _ in range(max_iterations):
        neigh = (edges.join(labels, edges["b"] == labels["node_id"])
                 .groupBy("a").agg(F.min("component_id").alias("nbr_min")))
        updated = (labels.join(neigh, labels["node_id"] == neigh["a"], "left")
                   .select("node_id",
                           F.least("component_id",
                                   F.coalesce("nbr_min", "component_id"))
                           .alias("component_id")))
        updated = updated.localCheckpoint(eager=True)  # cut lineage per round
        changed = (updated.alias("u")
                   .join(labels.alias("l"), "node_id")
                   .where(F.col("u.component_id") != F.col("l.component_id"))
                   .limit(1).count())
        labels = updated
        if changed == 0:
            break
    return labels


def dedup_keep_components(df: DataFrame, pairs: DataFrame, id_col: str,
                          id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Corpus minus near-duplicates, keeping the min-id representative of
    each duplicate CLUSTER (exact via connected components)."""
    comps = connected_components(pairs, id_a, id_b)
    drop = comps.where(F.col("node_id") != F.col("component_id")) \
                .select(F.col("node_id").alias(id_col))
    return df.join(drop, id_col, "left_anti")
