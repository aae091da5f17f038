"""Loaders = per-group join strategies (SURVEY §2.2), set-oriented.

The reference calls ``loader.load_data(group_id, config)`` once PER entity id
(reference transformer.py:1035-1087) — an O(entities) query loop.  Each
loader here performs ONE join keyed by the group id column, producing the
fact rows for ALL groups at once; downstream transformers then aggregate by
that group column.

All reference tables (hierarchies, plots, shapes) are small relative to the
fact table, so every join here broadcasts the reference side — at 100 TB the
fact table never shuffles for these lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.hierarchy import ancestor_closure, subtree_join
from niamoto_spark.registry import PluginType, register


def _clear_gid_collision(data: DataFrame, key: str,
                         group_id: str) -> tuple[DataFrame, str]:
    """If the fact table already has a column named like the group id, the
    tag join would produce an AMBIGUOUS duplicate.  Preserve the fact column
    under ``__src_<name>`` (documented) so the canonical name is the tag.
    When the collision IS the join key, the key is renamed too — returns
    (data, effective_key)."""
    if group_id in data.columns:
        renamed = f"__src_{group_id}"
        data = data.withColumnRenamed(group_id, renamed)
        if key == group_id:
            key = renamed
    return data, key


@register("direct_reference", PluginType.LOADER)
def direct_reference(data: DataFrame, key: str, groups: DataFrame,
                     group_id: str, ref_key: str | None = None) -> DataFrame:
    """Equi-join of the fact table to its grouping entity (reference:
    loaders/direct_reference.py:116-205, SQL :187-202).  When ``ref_key``
    differs from ``group_id`` the join goes through the reference table's
    alternate key, same as the reference's two-table SQL variant.

    Returns the fact rows tagged with the group id column.
    """
    from niamoto_spark.functions import hashed_dim_join

    data, key = _clear_gid_collision(data, key, group_id)
    join_key = ref_key or group_id
    # hashed_dim_join: string fact keys probe on one xxhash64 long
    # (LongHashedRelation) with an exact recheck; integral keys take
    # the plain broadcast join — the probe side is the 100 TB one.
    return hashed_dim_join(data, groups, key, [group_id],
                           dim_key=join_key)


@register("join_table", PluginType.LOADER)
def join_table(data: DataFrame, data_key: str,
               bridge: DataFrame, bridge_source: str, bridge_ref: str,
               groups: DataFrame, group_id: str,
               carry: list[str] | None = None) -> DataFrame:
    """Many-to-many bridge: fact JOIN bridge ON fact.id = bridge.source,
    grouped by bridge.reference (reference: loaders/join_table.py:124-178).
    Two chained joins; the bridge and group tables broadcast.

    ``carry`` lists extra ``groups`` columns to attach in the SAME group
    join — callers that need a display column (e.g. a name) alongside the
    group id would otherwise pay a third probe pass over the fact table
    re-joining the group table for it (guide §2.4: remove redundant
    joins; at 100 TB every extra broadcast join is a full pass).
    """
    from niamoto_spark.functions import hashed_dim_join

    data, data_key = _clear_gid_collision(data, data_key, group_id)
    b = bridge.select(F.col(bridge_source).alias("__b_src"),
                      F.col(bridge_ref).alias("__b_ref"))
    tagged = hashed_dim_join(data, b, data_key, ["__b_ref"],
                             dim_key="__b_src")
    return hashed_dim_join(tagged, groups, "__b_ref",
                           [group_id, *(carry or [])],
                           dim_key=group_id).drop("__b_ref")


@register("nested_set", PluginType.LOADER)
def nested_set_loader(data: DataFrame, key: str,
                      hierarchy: DataFrame, node_key: str = "id",
                      ancestor_alias: str = "ancestor_id") -> DataFrame:
    """Descendant-subtree membership via nested-set range join (reference:
    loaders/nested_set.py:147-185).  Instead of fetching one node's
    (lft, rght) per query, ``subtree_join`` attaches EVERY ancestor id to
    each fact row in a single broadcast range join — aggregating by
    ``ancestor_alias`` afterwards yields the per-subtree result for all
    subtrees at once.
    """
    return subtree_join(data, key, hierarchy, node_key, ancestor_alias)


@register("adjacency_list", PluginType.LOADER)
def adjacency_list_loader(data: DataFrame, key: str,
                          nodes: DataFrame, node_key: str = "id",
                          parent_col: str = "parent_id",
                          ancestor_alias: str = "ancestor_id",
                          max_depth: int = 32) -> DataFrame:
    """Node + descendants via the adjacency encoding (reference:
    loaders/adjacency_list.py:119-208 uses a recursive CTE).  Spark SQL has
    no recursive CTE, so the closure (node, ancestor, depth) is materialized
    by a bounded iterative join (hierarchy.ancestor_closure) and then the
    fact table equi-joins the closure — one distributed join, no recursion
    in the hot path.
    """
    from niamoto_spark.functions import hashed_dim_join

    closure = ancestor_closure(nodes, node_key, parent_col, max_depth)
    cl = closure.select(F.col("node_id").alias("__node"),
                        F.col("ancestor_id").alias(ancestor_alias))
    return hashed_dim_join(data, cl, key, [ancestor_alias],
                           dim_key="__node")


@register("stats_loader", PluginType.LOADER)
def stats_loader(stats: DataFrame, match_field: str,
                 groups: DataFrame, group_id: str,
                 ref_field: str | None = None,
                 carry: list[str] | None = None) -> DataFrame:
    """Lookup of precomputed stats rows by a match field, with the
    reference's fuzzy string/number coercion (reference:
    loaders/stats_loader.py:113-318; CSV filter :196-211).  Set-oriented:
    one equi-join on the (string-normalized) match key.

    ``carry``: extra ``groups`` columns attached in the same join (see
    ``join_table`` — saves a redundant second probe pass for callers
    needing a display column).
    """
    from niamoto_spark.functions import hashed_dim_join

    ref_field = ref_field or group_id
    stats, match_field = _clear_gid_collision(stats, match_field, group_id)
    norm = lambda c: F.trim(F.col(c).cast("string"))  # noqa: E731
    g = groups.select(F.col(group_id), *(carry or []),
                      norm(ref_field).alias("__match"))
    return hashed_dim_join(stats.withColumn("__mkey", norm(match_field)),
                           g, "__mkey", [group_id, *(carry or [])],
                           dim_key="__match").drop("__mkey")


@register("spatial_containment", PluginType.LOADER)
def spatial_containment(data: DataFrame, point_wkt_col: str,
                        shapes: DataFrame, shape_id: str,
                        shape_wkt_col: str) -> DataFrame:
    """Points-in-polygon membership (reference: loaders/spatial.py:91-131
    uses per-shape ``ST_Contains`` SQL).  Implemented as a broadcast join of
    the (small) shape table against the fact table with a vectorized
    Shapely containment check via mapInPandas when shapely is available;
    falls back to a bounding-box prefilter-only strategy otherwise.

    See operators/geospatial.py for the implementation details; this wrapper
    keeps the loader-name contract.
    """
    from niamoto_spark.operators.geospatial import points_in_polygons

    return points_in_polygons(data, point_wkt_col, shapes, shape_id, shape_wkt_col)


def hierarchical_top_ranking(data: DataFrame, key: str,
                             hierarchy: DataFrame,
                             target_level: int | None = None,
                             target_ranks: list[str] | None = None,
                             limit: int = 10,
                             node_key: str = "id") -> DataFrame:
    """top_ranking(mode=hierarchical): roll each fact row up to the nearest
    ancestor at a target rank, then count + top-N (reference:
    top_ranking.py:383-432 walks parent pointers per id; here it's the
    nested-set subtree join + one aggregate).
    Output: (item, value, rank) where item is the ancestor's rank_value.
    """
    # Pre-aggregate facts per LEAF below the range join (guide §2.3
    # "aggregate before you shuffle", r15): the rollup is a pure count,
    # and counts are additive over subtree membership, so the range
    # join fans out |leaves| count rows instead of every fact row — at
    # scale the fact table is aggregated once and never ×depth-fanned.
    # Identical output: a leaf with N facts contributes N to each
    # enclosing ancestor either way; NULL / unmatched keys drop in the
    # same inner equi-join.  Ancestor metadata rides the subtree range
    # join (r14: the separate broadcast(anc) re-join was a redundant
    # third probe pass).
    per_leaf = data.groupBy(key).agg(F.count(F.lit(1)).alias("__leaf_n"))
    joined = subtree_join(per_leaf, key, hierarchy, node_key,
                          "ancestor_id",
                          carry=["rank_name", "level", "rank_value"]) \
        .withColumnRenamed("rank_value", "item")
    if target_level is not None:
        joined = joined.where(F.col("level") == target_level)
    if target_ranks:
        joined = joined.where(F.col("rank_name").isin(list(target_ranks)))
    from niamoto_spark.operators.aggregation import top_ranking

    return top_ranking(joined, [], "item", limit=limit,
                       weight_col="__leaf_n")
