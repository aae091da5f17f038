"""Graph ranking over candidate-pair edge lists (PageRank).

Complements connected components (operators/components.py): components
give cluster MEMBERSHIP; PageRank gives per-node CENTRALITY — e.g. which
document inside a near-dup/similarity neighborhood is the canonical one,
or which user in an interaction graph anchors a community.

Deterministic by construction (fixed iteration count, no RNG, closed-form
uniform init), so an external engine can replay it — the same
oracle-ability policy as operators/clustering.py's k-means.

Spark-first shape: ranks live in a DataFrame keyed by node; one iteration
is  ranks ⋈ out-edges → groupBy(dst) sum → add teleport — two hash
shuffles on node id, NOTHING collected to the driver (the loop carries
only a DataFrame lineage, cut per round with localCheckpoint like the
label-propagation loop).  Dangling nodes (no out-edges) redistribute
their mass uniformly, the standard correction, computed as a scalar agg
per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("pagerank", PluginType.TRANSFORMER)
def pagerank(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
             directed: bool = False, damping: float = 0.85,
             iters: int = 3, round_dp: int | None = 6) -> DataFrame:
    """(node_id, rank) after ``iters`` power iterations.

    Undirected mode (default — similarity pairs have no direction) walks
    each edge both ways.  Ranks sum to 1 over the nodes appearing in the
    edge list; init is uniform 1/N.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if not directed:
        edges = edges.union(
            pairs.select(F.col(id_b).alias("src"),
                         F.col(id_a).alias("dst")))
    edges = edges.distinct()

    nodes = (edges.select(F.col("src").alias("node_id"))
             .union(edges.select(F.col("dst").alias("node_id")))
             .distinct())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    # Rank mass rides as integer PICO-UNITS (1e12): inflow sums and the
    # dangling-mass scalar become exact bigint arithmetic, so results
    # are independent of partition/sum order (see
    # personalized_pagerank; composed-probe find, round 12).
    pu = 1_000_000_000_000
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn(
        # int(x + 0.5) = HALF_UP like both engines' SQL round();
        # Python round() would be banker's
        "rank_pu", F.lit(int(pu / n + 0.5)).cast("bigint"))

    for _ in range(iters):
        contrib = (edges
                   .join(ranks, edges["src"] == ranks["node_id"])
                   .join(outdeg, "src")
                   .select("dst",
                           F.round(F.col("rank_pu") / F.col("deg"))
                           .cast("bigint").alias("c")))
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        if directed:
            # dangling mass: rank held by nodes with no out-edges
            dangling_pu = (ranks.join(outdeg,
                                      ranks["node_id"] == outdeg["src"],
                                      "left_anti")
                           .agg(F.coalesce(F.sum("rank_pu"), F.lit(0)))
                           .collect()[0][0])  # one scalar per iteration
        else:
            dangling_pu = 0  # every undirected node has an out-edge
        base = (1.0 - damping) * (pu / n) + damping * (dangling_pu / n)
        ranks = (nodes.join(inflow, nodes["node_id"] == inflow["dst"],
                            "left")
                 .select("node_id",
                         F.round(F.lit(base) + F.lit(damping) *
                                 F.coalesce("inflow", F.lit(0)))
                         .cast("bigint").alias("rank_pu")))
        ranks = ranks.localCheckpoint(eager=True)

    out = ranks.select(
        "node_id",
        (F.col("rank_pu") / F.lit(float(pu))).alias("rank"))
    if round_dp is not None:
        out = out.select("node_id", F.round("rank", round_dp)
                         .alias("rank"))
    return out


@register("triangle_count", PluginType.TRANSFORMER)
def triangle_count(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b") -> DataFrame:
    """Per-node triangle counts over an undirected edge list.

    Uses the degree-ordered orientation (each undirected edge directed
    from its lexicographically smaller endpoint): every triangle
    {a<b<c} is found EXACTLY once as a<b, b<c, a<c, so the two-hop join
    never double-counts and the join fan-out is bounded by the oriented
    out-degrees — the standard trick that keeps hub nodes from squaring
    the wedge join (cf. node-iterator++ in the triangle-listing
    literature).

    Output: (node_id, n_triangles) for every node in >= 1 triangle.
    """
    e = (pairs.select(F.least(id_a, id_b).alias("a"),
                      F.greatest(id_a, id_b).alias("b"))
         .where(F.col("a") != F.col("b"))
         .distinct())
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")                      # x<y<z candidates
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = wedges.join(closing, ["x", "z"])         # x-z closes it
    per_node = (tri.select(F.col("x").alias("node_id"))
                .union(tri.select(F.col("y")))
                .union(tri.select(F.col("z"))))
    return per_node.groupBy("node_id").agg(
        F.count(F.lit(1)).alias("n_triangles"))


@register("bfs_hops", PluginType.TRANSFORMER)
def bfs_hops(pairs: DataFrame, sources: DataFrame,
             id_a: str = "id_a", id_b: str = "id_b",
             source_col: str = "node_id", max_hops: int = 6,
             directed: bool = False) -> DataFrame:
    """Multi-source BFS: minimum hop distance from ANY source node to
    every reachable node within ``max_hops``.

    The relational shortest-path primitive the similarity/lineage graphs
    need ("how far is this doc from a known-contaminated seed?", "which
    taxa are within 2 links of a type specimen?").  Complements
    pagerank/triangle_count; the reference's closest surface is the
    nested-set ancestor walk (core/components/taxonomy, which only walks
    trees) — this walks arbitrary graphs.

    Spark-first: classic frontier expansion.  Each round is
    frontier ⋈ edges → dedup → anti-join against visited — two hash
    shuffles on node id, nothing on the driver but a per-round emptiness
    scalar.  Lineage is cut per round with localCheckpoint (same policy
    as pagerank's rank loop); rounds are bounded by ``max_hops`` so the
    plan cannot grow unboundedly.  At 100 TB scale the visited set stays
    a DataFrame (shuffle-partitioned on node id), never a driver
    structure.

    Output: (node_id, hops) — sources themselves at hops=0.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if not directed:
        edges = edges.union(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    # materialize the edge list ONCE — the frontier loop joins it every
    # hop, and without cutting lineage here the whole upstream pipeline
    # (e.g. a candidate-pair generator) would re-execute per hop
    edges = (edges.where(F.col("src") != F.col("dst")).distinct()
             .localCheckpoint(eager=True))

    visited = (sources.select(F.col(source_col).alias("node_id"))
               .distinct().withColumn("hops", F.lit(0)))
    frontier = visited.select("node_id")
    for hop in range(1, max_hops + 1):
        nxt = (edges.join(frontier, edges["src"] == frontier["node_id"])
               .select(F.col("dst").alias("node_id"))
               .distinct()
               .join(visited.select("node_id"), "node_id", "left_anti")
               .withColumn("hops", F.lit(hop)))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node_id")
    return visited


@register("clustering_coefficient", PluginType.TRANSFORMER)
def clustering_coefficient(pairs: DataFrame, id_a: str = "id_a",
                           id_b: str = "id_b",
                           round_dp: int = 6) -> DataFrame:
    """Local clustering coefficient per node: lcc(v) =
    2·T(v) / (deg(v)·(deg(v)-1)) — how close each node's neighborhood
    is to a clique (community tightness; near-duplicate clusters show
    lcc ~ 1, hub-and-spoke crawl graphs ~ 0).

    Reuses triangle_count's degree-ordered orientation for T(v) (one
    wedge join, fan-out bounded by oriented out-degree) plus one
    degree aggregation; nodes with deg < 2 are reported with lcc 0.
    Output: (node_id, degree, n_triangles, lcc)."""
    e = (pairs.select(F.least(id_a, id_b).alias("a"),
                      F.greatest(id_a, id_b).alias("b"))
         .where(F.col("a") != F.col("b"))
         .distinct())
    deg = (e.select(F.col("a").alias("node_id"))
           .union(e.select(F.col("b")))
           .groupBy("node_id").agg(F.count(F.lit(1)).alias("degree")))
    tri = triangle_count(e, "a", "b")
    joined = deg.join(tri, "node_id", "left").na.fill(
        {"n_triangles": 0})
    lcc = F.when(
        F.col("degree") >= 2,
        F.round(2.0 * F.col("n_triangles")
                / (F.col("degree") * (F.col("degree") - 1.0)),
                round_dp)).otherwise(F.lit(0.0))
    return joined.select("node_id", "degree", "n_triangles",
                         lcc.alias("lcc"))


@register("label_propagation", PluginType.TRANSFORMER)
def label_propagation(pairs: DataFrame, id_a: str = "id_a",
                      id_b: str = "id_b", iters: int = 2) -> DataFrame:
    """Community detection by synchronous label propagation (LPA):
    every node starts labeled with its own id; each round it adopts the
    most frequent label among its neighbors, ties broken toward the
    SMALLEST label.  Fixed iteration count + deterministic tie rule
    make the whole run replayable in SQL (same oracle-ability policy as
    ``pagerank`` / clustering.py's k-means) — no RNG, no async sweep
    order.

    Communities are finer than connected components
    (operators/components.py): a long chain is ONE component but LPA
    splits it at sparse cuts, which is the right granularity for
    "which near-dup neighborhood does this doc anchor to".

    Distribution: one round = edges ⋈ labels (shuffle on node id) →
    count per (node, neighbor-label) → window argmax per node — two
    hash shuffles per round, nothing on the driver; lineage cut per
    round with localCheckpoint.  Returns (node_id, community).
    """
    from pyspark.sql import Window

    edges = (pairs.select(F.col(id_a).alias("src"),
                          F.col(id_b).alias("dst"))
             .unionByName(pairs.select(F.col(id_b).alias("src"),
                                       F.col(id_a).alias("dst")))
             .distinct())
    labels = (edges.select(F.col("src").alias("node_id")).distinct()
              .withColumn("lbl", F.col("node_id")))
    pick = Window.partitionBy("node_id").orderBy(
        F.col("c").desc(), F.col("lbl").asc())
    for _ in range(iters):
        counted = (edges.join(labels.withColumnRenamed("node_id", "src"),
                              "src")
                   .groupBy(F.col("dst").alias("node_id"), "lbl")
                   .agg(F.count(F.lit(1)).alias("c")))
        labels = (counted.withColumn("__rk", F.row_number().over(pick))
                  .where(F.col("__rk") == 1)
                  .select("node_id", "lbl")
                  .localCheckpoint(eager=False))
    return labels.select("node_id", F.col("lbl").alias("community"))


@register("kcore_peel", PluginType.TRANSFORMER)
def kcore_peel(pairs: DataFrame, k: int, id_a: str = "id_a",
               id_b: str = "id_b", rounds: int = 3) -> DataFrame:
    """Iterative k-core peeling: repeatedly delete nodes whose degree
    in the SURVIVING subgraph is below ``k``.  After enough rounds the
    survivors are exactly the k-core — the standard "dense kernel"
    extraction that strips hanger-on nodes from a similarity graph
    before community/centrality analysis.

    A fixed ``rounds`` count keeps the operator deterministic and
    SQL-replayable (the oracle unrolls each peel).  Peeling is
    monotone, so extra rounds past convergence are no-ops; callers
    needing the exact fixpoint raise ``rounds`` (diameter-bounded).

    Distribution: one round = degree aggregation on node id + a
    broadcast-able semi join of edges against surviving nodes — two
    shuffles a round on the shrinking edge set, lineage cut per round.
    Returns surviving (node_id, degree) — degree within the core.
    """
    edges = (pairs.select(F.col(id_a).alias("src"),
                          F.col(id_b).alias("dst"))
             .unionByName(pairs.select(F.col(id_b).alias("src"),
                                       F.col(id_a).alias("dst")))
             .distinct())
    for _ in range(rounds):
        deg = (edges.groupBy("src")
               .agg(F.count(F.lit(1)).alias("deg")))
        keep = deg.where(F.col("deg") >= k).select("src")
        edges = (edges.join(keep, "src", "left_semi")
                 .join(keep.withColumnRenamed("src", "dst"),
                       "dst", "left_semi")
                 .localCheckpoint(eager=False))
    return (edges.groupBy(F.col("src").alias("node_id"))
            .agg(F.count(F.lit(1)).alias("degree"))
            .where(F.col("degree") >= k))


@register("personalized_pagerank", PluginType.TRANSFORMER)
def personalized_pagerank(pairs: DataFrame, seeds: DataFrame,
                          id_a: str = "id_a", id_b: str = "id_b",
                          seed_col: str = "node_id",
                          damping: float = 0.85, iters: int = 2,
                          round_dp: int = 6) -> DataFrame:
    """Personalized PageRank: random walks that TELEPORT back to the
    seed set instead of everywhere — rank becomes "relevance to these
    seeds", the similarity-expansion primitive behind related-items
    and seed-based corpus growing (find documents like this labeled
    handful).

    Undirected edges, uniform seed teleport, fixed iterations — same
    oracle-ability policy as ``pagerank`` (the oracle unrolls every
    round).  Per round: one edge⋈rank shuffle + one inflow aggregate;
    nothing driver-side but the seed count."""
    edges = (pairs.select(F.col(id_a).alias("src"),
                          F.col(id_b).alias("dst"))
             .unionByName(pairs.select(F.col(id_b).alias("src"),
                                       F.col(id_a).alias("dst")))
             .distinct())
    nodes = edges.select(F.col("src").alias("node_id")).distinct()
    s = seeds.select(F.col(seed_col).alias("node_id")).distinct() \
        .join(nodes, "node_id", "left_semi")
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed is in the graph")
    # Rank mass rides as integer PICO-UNITS (1e12) so every inflow
    # aggregate is an exact bigint sum — order-INDEPENDENT, unlike a
    # double sum whose last ulp depends on partition order (composed
    # probe r12: a 6dp-boundary rank value flipped between engines).
    # The only float ops left are per-term div/mul on identical inputs,
    # which IEEE-754 makes deterministic on both engines.
    pu = 1_000_000_000_000
    # HALF_UP like both engines' SQL round(), not banker's
    teleport_pu = int(pu / n_seeds + 0.5)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    is_seed = s.withColumn("__t", F.lit(teleport_pu).cast("bigint"))
    ranks = (nodes.join(is_seed, "node_id", "left")
             .select("node_id",
                     F.coalesce("__t", F.lit(0)).cast("bigint")
                     .alias("rank_pu")))
    for _ in range(iters):
        contrib = (edges
                   .join(ranks, edges["src"] == ranks["node_id"])
                   .join(outdeg, "src")
                   .select("dst",
                           F.round(F.col("rank_pu") / F.col("deg"))
                           .cast("bigint").alias("c")))
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        ranks = (nodes
                 .join(inflow, nodes["node_id"] == inflow["dst"], "left")
                 .join(is_seed, "node_id", "left")
                 .select("node_id",
                         F.round((1.0 - damping)
                                 * F.coalesce("__t", F.lit(0))
                                 + damping * F.coalesce("inflow", F.lit(0)))
                         .cast("bigint").alias("rank_pu"))
                 .localCheckpoint(eager=True))
    return ranks.select("node_id",
                        F.round(F.col("rank_pu") / F.lit(float(pu)),
                                round_dp).alias("rank"))


@register("adamic_adar", PluginType.TRANSFORMER)
def adamic_adar(membership: DataFrame, item_col: str, group_col: str,
                max_group_size: int = 1000,
                round_dp: int = 4) -> DataFrame:
    """Adamic–Adar link prediction over a bipartite membership table
    (item, group): two items sharing groups get score
    Σ_{g shared} 1 / ln(|g|) — shared SMALL groups are strong evidence
    of a link, shared huge groups near-none (the weighting that makes
    AA beat raw common-neighbor counts).

    Shape: one group-size aggregate, one within-group self-join
    (item_a < item_b) carrying the 1/ln(size) weight, one pair
    aggregate — all equi-joins on the group key, co-partitioned.
    Viral groups are the quadratic hazard (C(n,2) pairs): groups over
    ``max_group_size`` are EXCLUDED before the self-join (logged),
    the same bounded-hot-key guard as ngram_jaccard_pairs; their AA
    contribution is ≤ 1/ln(cap) per pair, the part AA already calls
    noise.  Returns (item_a, item_b, common_groups, aa_score)."""
    import logging
    log = logging.getLogger(__name__)

    m = (membership.select(F.col(item_col).alias("item"),
                           F.col(group_col).alias("grp")).distinct())
    sizes = m.groupBy("grp").agg(F.count(F.lit(1)).alias("gsz"))
    over = sizes.where(F.col("gsz") > max_group_size)
    if over.limit(1).count():
        log.warning("adamic_adar: group(s) over %d members excluded "
                    "from pair generation", max_group_size)
    ok = sizes.where((F.col("gsz") >= 2)
                     & (F.col("gsz") <= max_group_size))
    # no broadcast hint: group count scales with the data (AQE
    # broadcasts when the size table is actually small)
    wm = m.join(ok, "grp")
    a = wm.select("grp", F.col("item").alias("item_a"), "gsz")
    b = wm.select("grp", F.col("item").alias("item_b"))
    pairs = a.join(b, "grp").where(F.col("item_a") < F.col("item_b"))
    return (pairs.groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("common_groups"),
                 F.round(F.sum(F.lit(1.0) / F.log(F.col("gsz"))),
                         round_dp).alias("aa_score")))


@register("sssp_rounds", PluginType.TRANSFORMER)
def sssp_rounds(edges: DataFrame, sources: DataFrame,
                src_col: str = "src", dst_col: str = "dst",
                weight_col: str = "w", rounds: int = 4,
                round_dp: int = 4) -> DataFrame:
    """Weighted single-source shortest paths, Bellman-Ford with a
    FIXED round budget: after k rounds every shortest path of <= k
    edges is exact — the bounded-hop distance bfs_hops (unweighted)
    can't give.  Fixing the rounds makes the operator deterministic,
    cost-bounded (k scans of the edge list) and SQL-replayable by
    unrolling the same k relaxations.

    Per round: dist ⋈ edges on the source endpoint (the one equi-join
    shuffle), per-node min, union with the previous frontier, min
    again; localCheckpoint truncates the growing lineage like
    pagerank does.  Returns (node, dist) for reached nodes."""
    e = edges.select(F.col(src_col).alias("s"),
                     F.col(dst_col).alias("d"),
                     F.col(weight_col).cast("double").alias("w"))
    dist = sources.select(F.col(sources.columns[0]).alias("n"),
                          F.lit(0.0).alias("dist")).distinct()
    for _ in range(int(rounds)):
        relaxed = (dist.join(e, dist["n"] == e["s"])
                   .select(F.col("d").alias("n"),
                           (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.unionByName(relaxed)
                .groupBy("n").agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True))
    return dist.select(F.col("n").alias("node"),
                       F.round("dist", round_dp).alias("dist"))
