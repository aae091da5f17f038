"""PageRank (operators/graph.py) + weighted sampling
(operators/text.py:weighted_sample)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from niamoto_spark.operators.graph import pagerank
from niamoto_spark.operators.text import weighted_sample


def test_pagerank_star_graph_center_dominates(spark):
    """Star: center linked to 4 leaves — center rank must exceed every
    leaf and ranks must sum to 1."""
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], ["id_a", "id_b"])
    r = {row["node_id"]: row["rank"]
         for row in pagerank(pairs, iters=10, round_dp=None).collect()}
    assert r[0] > max(r[i] for i in range(1, 5))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    # leaves are symmetric
    assert len({round(r[i], 12) for i in range(1, 5)}) == 1


def test_pagerank_directed_dangling_mass_conserved(spark):
    """Directed chain 1->2->3: node 3 is dangling; total rank must still
    sum to 1 (dangling mass redistributed)."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    r = pagerank(pairs, directed=True, iters=8, round_dp=None).collect()
    assert sum(row["rank"] for row in r) == pytest.approx(1.0, abs=1e-9)
    ranks = {row["node_id"]: row["rank"] for row in r}
    assert ranks[3] > ranks[1]  # sink accumulates


def test_pagerank_empty_edges(spark):
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert pagerank(pairs).count() == 0


def _py_key(doc_id: int, w: float, seed: str = "") -> float:
    h = hashlib.md5(f"{doc_id}{seed}".encode()).hexdigest()[:8]
    u = (int(h, 16) + 0.5) / 2 ** 32
    return -math.log(u) / w


def test_weighted_sample_replicates_hashlib(spark):
    rows = [(i, float(10 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sorted(r["doc_id"] for r in
                 weighted_sample(df, "doc_id", "w", k=15).collect())
    want = sorted(i for i, w in
                  sorted(rows, key=lambda t: (_py_key(t[0], t[1]), t[0]))
                  [:15])
    assert got == want


def test_weighted_sample_heavy_weights_win_in_expectation(spark):
    """One row with overwhelming weight is essentially always sampled."""
    rows = [(i, 1.0) for i in range(100)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = {r["doc_id"]
           for r in weighted_sample(df, "doc_id", "w", k=5).collect()}
    assert 999 in got


def test_weighted_sample_seed_changes_selection(spark):
    rows = [(i, 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    a = {r["doc_id"]
         for r in weighted_sample(df, "doc_id", "w", k=20).collect()}
    b = {r["doc_id"]
         for r in weighted_sample(df, "doc_id", "w", k=20,
                                  seed="other").collect()}
    assert a != b


def test_weighted_sample_plan_is_take_ordered(spark):
    """Global top-k must plan as TakeOrderedAndProject, never a full
    sort-shuffle."""
    df = spark.createDataFrame([(i, 1.0) for i in range(50)],
                               ["doc_id", "w"])
    plan = weighted_sample(df, "doc_id", "w", k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_dsir_importance_prefers_target_like_docs(spark):
    """Docs sharing the target slice's vocabulary must outscore docs made
    of source-only vocabulary."""
    from niamoto_spark.operators.text import dsir_importance

    rows = ([(i, "tgt", "quantum flux resonance entangle qubit")
             for i in range(20)] +
            [(100 + i, "web", "cheap pills click here buy now")
             for i in range(20)] +
            [(900, "web", "quantum flux resonance qubit entangle"),
             (901, "web", "cheap pills buy now click here")])
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    scored = {r["doc_id"]: r["importance"]
              for r in dsir_importance(
                  df, "doc_id", "text",
                  is_target=F.col("source") == "tgt").collect()}
    assert scored[900] > scored[901]
    assert scored[0] > scored[100]


def test_dsir_empty_doc_scores_null(spark):
    from niamoto_spark.operators.text import dsir_importance

    df = spark.createDataFrame(
        [(1, "t", "alpha beta"), (2, "s", "gamma delta"), (3, "s", "")],
        ["doc_id", "source", "text"])
    rows = {r["doc_id"]: r for r in dsir_importance(
        df, "doc_id", "text",
        is_target=F.col("source") == "t").collect()}
    assert rows[3]["importance"] is None and rows[3]["n_tokens"] == 0


def test_split_assign_deterministic_and_proportional(spark):
    from niamoto_spark.operators.text import split_assign

    df = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = split_assign(df, "doc_id", w)
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.9) < 0.03
    b = {r["doc_id"]: r["split"] for r in a.collect()}
    c = {r["doc_id"]: r["split"]
         for r in split_assign(df, "doc_id", w).collect()}
    assert b == c  # exact replay
    # different seed reshuffles
    d = {r["doc_id"]: r["split"]
         for r in split_assign(df, "doc_id", w, seed="2").collect()}
    assert b != d


def test_contrastive_pairs_structure(spark):
    from niamoto_spark.operators.contrastive import contrastive_pairs

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], ["doc_id", "text"])
    pos = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.8)], ["id_a", "id_b", "jaccard"])
    out = contrastive_pairs(docs, "doc_id", "text", pos,
                            n_negatives=2, n_buckets=4).collect()
    pos_rows = [r for r in out if r["label"] == "pos"]
    neg_rows = [r for r in out if r["label"] == "neg"]
    # both orientations of both positives
    assert {(r["anchor_id"], r["other_id"]) for r in pos_rows} == \
        {(1, 2), (2, 1), (3, 4), (4, 3)}
    assert all(r["score"] is not None for r in pos_rows)
    assert all(r["score"] is None for r in neg_rows)
    # negatives never collide with positives or self
    pos_set = {(r["anchor_id"], r["other_id"]) for r in pos_rows}
    for r in neg_rows:
        assert (r["anchor_id"], r["other_id"]) not in pos_set
        assert r["anchor_id"] != r["other_id"]
    # bounded per anchor
    from collections import Counter
    per_anchor = Counter(r["anchor_id"] for r in neg_rows)
    assert all(v <= 2 for v in per_anchor.values())


# --- label propagation (operators/graph.py) --------------------------------

def test_lpa_two_cliques_converge(spark):
    from niamoto_spark.operators.graph import label_propagation
    # two triangles bridged by nothing: each collapses to its min id
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["node_id"]: r["community"]
           for r in label_propagation(df, iters=3).collect()}
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11] == out[12]
    assert out[1] != out[10]


def test_lpa_deterministic_tie_break(spark):
    from niamoto_spark.operators.graph import label_propagation
    # star: center 5 with leaves 1..4.  Round 1: center adopts min
    # leaf label (all tie at count 1) = 1; leaves adopt 5.  Fixed
    # iteration count => exactly reproducible.
    edges = [(5, 1), (5, 2), (5, 3), (5, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["node_id"]: r["community"]
           for r in label_propagation(df, iters=1).collect()}
    assert out[5] == 1
    assert out[1] == out[2] == out[3] == out[4] == 5


# --- k-core peeling --------------------------------------------------------

def test_kcore_strips_pendant_chain(spark):
    from niamoto_spark.operators.graph import kcore_peel
    # triangle 1-2-3 (the 2-core) with pendant chain 3-4-5
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["node_id"]: r["degree"]
           for r in kcore_peel(df, k=2, rounds=3).collect()}
    assert set(out) == {1, 2, 3}
    assert all(d == 2 for d in out.values())


def test_kcore_empty_when_no_core(spark):
    from niamoto_spark.operators.graph import kcore_peel
    # a path has no 2-core
    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    assert kcore_peel(df, k=2, rounds=3).count() == 0


def test_personalized_pagerank_concentrates_on_seed_cluster(spark):
    from niamoto_spark.operators.graph import personalized_pagerank
    # two cliques; seed in the first
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    seeds = spark.createDataFrame([(1,)], "node_id long")
    out = {r["node_id"]: r["rank"]
           for r in personalized_pagerank(df, seeds, iters=3).collect()}
    # all mass stays in the seed's component
    assert out[10] == out[11] == out[12] == 0.0
    assert out[1] > out[2] > 0


def test_personalized_pagerank_rejects_offgraph_seeds(spark):
    import pytest as _pt
    from niamoto_spark.operators.graph import personalized_pagerank
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    seeds = spark.createDataFrame([(99,)], "node_id long")
    with _pt.raises(ValueError, match="no seed"):
        personalized_pagerank(df, seeds)
