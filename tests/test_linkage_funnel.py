"""Fuzzy record linkage (operators/linkage.py) + funnel analysis
(operators/funnel.py)."""

from pyspark.sql import functions as F

from niamoto_spark.operators.funnel import funnel
from niamoto_spark.operators.linkage import fuzzy_dedup_keep, fuzzy_pairs


def test_fuzzy_pairs_within_block_only(spark):
    df = spark.createDataFrame(
        [(1, "smith john", "A"), (2, "smith jhon", "A"),
         (3, "smith john", "B"),   # identical name, other block: no pair
         (4, "totally different", "A")],
        ["rid", "name", "blk"])
    pairs = fuzzy_pairs(df, "rid", "name", "blk",
                        max_edit_distance=2).collect()
    assert [(r["id_a"], r["id_b"], r["edit_distance"]) for r in pairs] \
        == [(1, 2, 2)]
    assert 0.0 < pairs[0]["name_sim"] < 1.0


def test_fuzzy_block_cap_drops_megablock(spark):
    rows = [(i, f"name{i}", "hot") for i in range(50)]
    df = spark.createDataFrame(rows, ["rid", "name", "blk"])
    assert fuzzy_pairs(df, "rid", "name", "blk", max_edit_distance=2,
                       max_block_size=10).count() == 0


def test_fuzzy_dedup_keep(spark):
    df = spark.createDataFrame(
        [(1, "acme corp", "A"), (2, "acme corp.", "A"),
         (3, "other llc", "A")],
        ["rid", "name", "blk"])
    kept = fuzzy_dedup_keep(df, "rid", "name", "blk", max_edit_distance=1)
    assert sorted(r["rid"] for r in kept.collect()) == [1, 3]


def _funnel_events(spark):
    # u1 session 1: view -> click -> purchase (full conversion)
    # u1 session 2 (after >30min gap): view only
    # u2: click before view — strict order must NOT convert click
    rows = [
        ("u1", 100, 1, "view"), ("u1", 200, 2, "click"),
        ("u1", 300, 3, "purchase"),
        ("u1", 10_000, 4, "view"),
        ("u2", 100, 5, "click"), ("u2", 200, 6, "view"),
    ]
    return spark.createDataFrame(rows, ["user", "sec", "eid", "etype"])


def test_funnel_strict_order(spark):
    out = {r["stage"]: r["n_sessions"]
           for r in funnel(_funnel_events(spark), "user", "sec", "etype",
                           ["view", "click", "purchase"],
                           gap_s=1800, order_cols=["eid"]).collect()}
    # views: u1-s1, u1-s2, u2-s1 = 3; clicks after view: only u1-s1;
    # purchases after that click: only u1-s1
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_same_second_not_converted(spark):
    """A click at the same second as the first view is NOT strictly
    later — it must not convert."""
    rows = [("u", 100, 1, "view"), ("u", 100, 2, "click")]
    df = spark.createDataFrame(rows, ["user", "sec", "eid", "etype"])
    out = {r["stage"]: r["n_sessions"]
           for r in funnel(df, "user", "sec", "etype",
                           ["view", "click"], order_cols=["eid"]).collect()}
    assert out == {"view": 1, "click": 0}
