"""Hierarchies: derivation, nested sets, ancestor closure, subtree joins.

The reference stores every hierarchy (taxonomy / plots / shapes) with BOTH
encodings simultaneously — adjacency list (``parent_id``) traversed by
recursive CTEs (reference: src/niamoto/core/plugins/loaders/
adjacency_list.py:184-205) and nested sets (``lft``/``rght``) computed by a
DFS in pandas (src/niamoto/core/imports/hierarchy_builder.py:532-601) and
queried by range predicates (loaders/nested_set.py:177-185).

Spark has no recursive CTE, so this module provides the three strategies the
engine uses instead, in descending order of preference:

1. **Nested sets** -> descendant lookup becomes a *range join*
   (``child.lft BETWEEN anc.lft AND anc.rght``), one shuffle-free broadcast
   join for all ancestors at once.
2. **Ancestor closure table** (node_id, ancestor_id, depth) -> descendant
   lookup becomes a plain *equi join*; the closure is built once by an
   iterative self-join bounded by tree depth.
3. **Iterative frontier join** for truly unbounded recursion.

Scale note: hierarchy *nodes* are small (taxonomies ~1e4-1e6 rows) even when
the fact table is 100 TB, so nested-set numbering happens driver-side on
collected nodes, and the resulting table is broadcast into every join.  The
closure builder is fully distributed for the (rare) case of a huge tree.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Derivation: build hierarchy rows from a flat dataset's level columns
# ---------------------------------------------------------------------------

def derive_hierarchy(df: DataFrame, levels: Sequence[str],
                     id_offset: int = 1) -> DataFrame:
    """Derive a hierarchy table from the distinct level combinations of a
    flat dataset — the reference's "derived reference" import
    (hierarchy_builder.py:116-270): per-level UNION ALL explode of
    ``SELECT DISTINCT level1..levelN``, pipe-joined ``full_path`` keys,
    TRIM/NULLIF cleanup of incomplete rows, MIN() dedup.

    Returns columns: id, parent_id, level, rank_name, rank_value, full_path,
    lft, rght.  IDs are assigned by sorted full_path (stable across runs, as
    the reference's hash-or-sequence ids are, hierarchy_builder.py:423).

    Distributed part: the distinct+union explode (a shuffle over *distinct
    combinations*, tiny vs the fact table).  Driver part: nested-set
    numbering over the collected distinct nodes.
    """
    cleaned = df.select(
        *[F.nullif(F.trim(F.col(c).cast("string")), F.lit("")).alias(c)
          for c in levels]
    )
    # Per-level explode: one row per (prefix path, level) combination.
    # Rows with a NULL anywhere in the prefix are dropped at that depth —
    # the reference's incomplete-row cleanup (COALESCE/NULLIF/TRIM,
    # hierarchy_builder.py:137-138) never emits orphan paths either.
    pieces = []
    for depth, level_name in enumerate(levels):
        prefix = [F.col(c) for c in levels[: depth + 1]]
        prefix_ok = prefix[0].isNotNull()
        for p in prefix[1:]:
            prefix_ok = prefix_ok & p.isNotNull()
        pieces.append(
            cleaned
            .where(prefix_ok)
            .select(
                F.concat_ws("|", *prefix).alias("full_path"),
                F.lit(depth).alias("level"),
                F.lit(level_name).alias("rank_name"),
                F.col(level_name).alias("rank_value"),
                (F.concat_ws("|", *prefix[:-1]) if depth else F.lit(None).cast("string")).alias("parent_path"),
            )
            .distinct()
        )
    nodes_df = pieces[0]
    for p in pieces[1:]:
        nodes_df = nodes_df.unionByName(p)
    nodes = [r.asDict() for r in nodes_df.collect()]
    return _number_tree(df.sparkSession, nodes, id_offset)


def _number_tree(spark: SparkSession, nodes: list[dict], id_offset: int) -> DataFrame:
    """Assign ids + nested-set bounds via a driver-side DFS (small data)."""
    nodes.sort(key=lambda n: (n["level"], n["full_path"]))
    by_path = {n["full_path"]: n for n in nodes}
    children: dict[str | None, list[dict]] = {}
    for n in nodes:
        children.setdefault(n["parent_path"], []).append(n)
    for sibs in children.values():
        sibs.sort(key=lambda n: n["full_path"])

    next_id = id_offset
    for n in nodes:  # level-major order -> parents get ids before children
        n["id"] = next_id
        next_id += 1

    counter = {"v": 1}

    def dfs(node: dict) -> None:
        node["lft"] = counter["v"]; counter["v"] += 1
        for ch in children.get(node["full_path"], ()):
            dfs(ch)
        node["rght"] = counter["v"]; counter["v"] += 1

    for root in children.get(None, ()):
        dfs(root)

    rows = [
        (
            n["id"],
            by_path[n["parent_path"]]["id"] if n["parent_path"] else None,
            n["level"], n["rank_name"], n["rank_value"], n["full_path"],
            n["lft"], n["rght"],
        )
        for n in nodes
    ]
    return spark.createDataFrame(
        rows,
        "id bigint, parent_id bigint, level int, rank_name string, "
        "rank_value string, full_path string, lft int, rght int",
    )


# ---------------------------------------------------------------------------
# Nested sets over an existing adjacency list
# ---------------------------------------------------------------------------

def add_nested_sets(nodes: DataFrame, id_col: str = "id",
                    parent_col: str = "parent_id",
                    order_col: str | None = None) -> DataFrame:
    """Compute lft/rght for an adjacency-list table (driver DFS; hierarchy
    tables are small by design — see module docstring).  Mirrors the
    reference's import-time nested-set builder
    (hierarchy_builder.py:532-601).  ``order_col`` fixes sibling order
    (default: the id column) so numbering is deterministic.
    """
    order_col = order_col or id_col
    collected = nodes.select(id_col, parent_col, order_col).collect()
    # A NULL id can never be referenced as a parent nor joined back to
    # its bounds row (NULL never equi-joins), so such rows stay out of
    # the tree and pass through the left join below with NULL lft/rght.
    collected = [r for r in collected if r[id_col] is not None]
    ids = {r[id_col] for r in collected}
    children: dict = {}
    order_key = {}
    for r in collected:
        # A parent id that is NULL, self-referencing (a common root
        # encoding), or absent from the table (subsetted data) makes the
        # node a root — otherwise such subtrees would silently get NULL
        # bounds from the left join below.
        parent = r[parent_col]
        if parent == r[id_col] or parent not in ids:
            parent = None
        children.setdefault(parent, []).append(r[id_col])
        order_key[r[id_col]] = r[order_col]
    for sibs in children.values():
        # NULL order keys sort LAST (ties broken by id) — a pinned
        # convention, and one Python's bare tuple compare can't express
        # (None < int raises)
        sibs.sort(key=lambda i: (order_key[i] is None,
                                 0 if order_key[i] is None else order_key[i],
                                 i))

    # Iterative DFS: recursion would hit Python's stack limit on
    # path-shaped trees (~1000 deep).
    bounds: dict = {}
    counter = 1
    for root in children.get(None, ()):
        stack = [(root, iter(children.get(root, ())))]
        lfts = {root: counter}
        counter += 1
        while stack:
            node_id, it = stack[-1]
            ch = next(it, None)
            if ch is None:
                stack.pop()
                bounds[node_id] = (lfts[node_id], counter)
                counter += 1
            else:
                lfts[ch] = counter
                counter += 1
                stack.append((ch, iter(children.get(ch, ()))))
    if len(bounds) != len(ids):
        missing = sorted(ids - bounds.keys())[:5]
        raise ValueError(
            f"add_nested_sets: {len(ids) - len(bounds)} nodes are "
            f"unreachable from any root (parent cycle), e.g. {missing}")

    spark = nodes.sparkSession
    bounds_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in bounds.items()],
        f"{id_col} bigint, lft int, rght int",
    )
    return nodes.join(F.broadcast(bounds_df), id_col, "left")


def descendants(nodes_with_sets: DataFrame, ancestor_id,
                id_col: str = "id") -> DataFrame:
    """All nodes in the subtree rooted at ``ancestor_id`` (inclusive) via the
    nested-set range predicate (loaders/nested_set.py:177-185)."""
    anc = nodes_with_sets.where(F.col(id_col) == F.lit(ancestor_id)) \
                         .select(F.col("lft").alias("_alft"),
                                 F.col("rght").alias("_arght"))
    return (nodes_with_sets.crossJoin(F.broadcast(anc))
            .where((F.col("lft") >= F.col("_alft")) & (F.col("rght") <= F.col("_arght")))
            .drop("_alft", "_arght"))


def subtree_join(facts: DataFrame, fact_key: str,
                 nodes_with_sets: DataFrame, node_key: str = "id",
                 ancestor_alias: str = "ancestor_id",
                 leaf_key: str | None = None,
                 lft_col: str = "lft", rght_col: str = "rght") -> DataFrame:
    """Attach EVERY ancestor id to each fact row in one pass: facts equi-join
    their leaf node, then a broadcast *range join* against the (small)
    hierarchy maps each row to all enclosing subtrees.  This replaces the
    reference's per-entity nested-set query loop with a single job; rolling
    up then becomes a plain ``groupBy(ancestor_alias)``.

    ``leaf_key`` lets facts match the hierarchy on an alternate key (the
    reference's ``ref_key`` external id, loaders/nested_set.py:147-185)
    while ancestors are still identified by ``node_key``.
    """
    from niamoto_spark.functions import hashed_dim_join

    leaf = nodes_with_sets.select(
        F.col(leaf_key or node_key).alias("_leaf_id"),
        F.col(lft_col).alias("_leaf_lft"),
    )
    anc = nodes_with_sets.select(
        F.col(node_key).alias(ancestor_alias),
        F.col(lft_col).alias("_anc_lft"),
        F.col(rght_col).alias("_anc_rght"),
    )
    # the leaf equi-join probes once per FACT row — hashed_dim_join
    # keeps string ref keys on the fast single-long probe path
    tagged = hashed_dim_join(facts, leaf, fact_key, ["_leaf_lft"],
                             dim_key="_leaf_id")
    return (
        tagged
        .join(F.broadcast(anc),
              (F.col("_leaf_lft") >= F.col("_anc_lft"))
              & (F.col("_leaf_lft") <= F.col("_anc_rght")), "inner")
        .drop("_leaf_lft", "_anc_lft", "_anc_rght")
    )


# ---------------------------------------------------------------------------
# Ancestor closure / iterative recursion (adjacency-list strategy)
# ---------------------------------------------------------------------------

def ancestor_closure(nodes: DataFrame, id_col: str = "id",
                     parent_col: str = "parent_id",
                     max_depth: int = 32) -> DataFrame:
    """Transitive closure (node_id, ancestor_id, depth), depth 0 = self.

    Replaces the reference's recursive CTE (adjacency_list.py:184-205) with
    an iterative equi-join to fixpoint, bounded by ``max_depth``.  Fully
    distributed — each iteration is one broadcast-able join of the current
    frontier against the (small) parent map; real taxonomies are 4-6 levels
    deep so the loop runs a handful of times.
    """
    parent_map = nodes.select(
        F.col(id_col).alias("_pm_child"), F.col(parent_col).alias("_pm_parent")
    ).where(F.col(parent_col).isNotNull()).cache()

    closure = nodes.select(
        F.col(id_col).alias("node_id"),
        F.col(id_col).alias("ancestor_id"),
        F.lit(0).alias("depth"),
    )
    frontier = nodes.select(
        F.col(id_col).alias("node_id"),
        F.col(parent_col).alias("ancestor_id"),
        F.lit(1).alias("depth"),
    ).where(F.col(parent_col).isNotNull())

    depth = 1
    cached = []
    while depth <= max_depth:
        frontier = frontier.cache()
        cached.append(frontier)
        if frontier.isEmpty():
            break
        closure = closure.unionByName(frontier)
        depth += 1
        frontier = (
            frontier.join(F.broadcast(parent_map),
                          frontier["ancestor_id"] == F.col("_pm_child"), "inner")
            .select("node_id", F.col("_pm_parent").alias("ancestor_id"),
                    F.lit(depth).alias("depth"))
        )
    # materialize the union before releasing the per-level caches
    closure = closure.localCheckpoint(eager=True)
    for f in cached:
        f.unpersist()
    parent_map.unpersist()
    return closure
