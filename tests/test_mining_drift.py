"""Round-7 continuation operators: association rules, CUSUM, EWMA,
BFS hops, Pareto frontier, Benford audit, table fingerprint."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- itemsets

def test_association_rules_hand_computed(spark):
    from niamoto_spark.operators.itemsets import association_rules

    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "b"), (4, "b"),   # duplicate item in one basket: counts once
            (5, "a")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(df, "basket", "item", min_support=0.2)
    got = {(r.antecedent, r.consequent): r for r in out.collect()}

    # supports: a=4, b=3, c=2, n=5; pairs: ab=2, ac=2, bc=1
    assert got[("a", "b")].pair_count == 2
    assert got[("a", "b")].support == pytest.approx(0.4)
    assert got[("a", "b")].confidence == pytest.approx(0.5)
    assert got[("b", "a")].confidence == pytest.approx(round(2 / 3, 4))
    # lift(ab) = 2*5/(4*3)
    assert got[("a", "b")].lift == pytest.approx(round(10 / 12, 4))
    assert got[("a", "b")].lift == got[("b", "a")].lift
    # bc pair has support 1/5 = 0.2 -> min_count = max(1, int(0.2*5)) = 1
    assert ("b", "c") in got and ("c", "b") in got


def test_association_rules_min_support_prunes(spark):
    from niamoto_spark.operators.itemsets import association_rules

    rows = [(i, "common") for i in range(10)] + [(0, "rare")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(df, "basket", "item", min_support=0.5)
    # "rare" is infrequent -> no pair survives
    assert out.count() == 0


def test_association_rules_basket_cap_drops(spark):
    from niamoto_spark.operators.itemsets import association_rules

    rows = ([(1, f"i{k}") for k in range(6)] +
            [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")])
    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(df, "basket", "item", min_support=0.4,
                            max_basket_size=3)
    got = {(r.antecedent, r.consequent): r for r in out.collect()}
    # basket 1 dropped entirely: n_baskets=2, pair i0,i1 count 2
    assert got[("i0", "i1")].pair_count == 2
    assert got[("i0", "i1")].support == pytest.approx(1.0)


# ---------------------------------------------------------------- cusum

def _naive_cusum(xs, target, slack):
    sp = sn = 0.0
    out = []
    for x in xs:
        sp = max(0.0, sp + (x - target - slack))
        sn = max(0.0, sn + (target - slack - x))
        out.append((round(sp, 4), round(sn, 4)))
    return out


def test_cusum_matches_recurrence(spark):
    from niamoto_spark.operators.timeseries import cusum_changepoints

    xs = [50, 52, 49, 70, 71, 72, 40, 30, 55, 20, 21, 22, 90]
    rows = [("k", i, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, i int, x double")
    out = cusum_changepoints(df, "k", "i", "x", target=50.0, slack=5.0,
                             threshold=15.0)
    got = [(r.cusum_pos, r.cusum_neg, r.alarm)
           for r in out.orderBy("i").collect()]
    ref = _naive_cusum(xs, 50.0, 5.0)
    for (gp, gn, alarm), (rp, rn) in zip(got, ref):
        assert gp == pytest.approx(rp, abs=1e-6)
        assert gn == pytest.approx(rn, abs=1e-6)
        assert alarm == (rp > 15.0 or rn > 15.0)


def test_cusum_independent_keys(spark):
    from niamoto_spark.operators.timeseries import cusum_changepoints

    rows = [("a", 0, 100.0), ("b", 0, 50.0), ("a", 1, 100.0),
            ("b", 1, 50.0)]
    df = spark.createDataFrame(rows, "k string, i int, x double")
    out = cusum_changepoints(df, "k", "i", "x", target=50.0, slack=0.0,
                             threshold=75.0)
    got = {(r.k, r.i): r.cusum_pos for r in out.collect()}
    assert got[("a", 1)] == pytest.approx(100.0)
    assert got[("b", 1)] == pytest.approx(0.0)


# ---------------------------------------------------------------- ewma

def test_ewma_matches_pandas(spark):
    import pandas as pd

    from niamoto_spark.operators.timeseries import ewma

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)],
        "k string, i int, x double")
    out = ewma(df, "k", "i", "x", alpha=0.3, lookback=40)
    got = [r.ewma for r in out.orderBy("i").collect()]
    ref = pd.Series(xs).ewm(alpha=0.3, adjust=True).mean()
    for g, r in zip(got, ref):
        assert g == pytest.approx(round(r, 4), abs=2e-4)


def test_ewma_lookback_truncation_negligible(spark):
    from niamoto_spark.operators.timeseries import ewma

    xs = [float(i % 7) for i in range(200)]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)],
        "k string, i int, x double")
    full = ewma(df, "k", "i", "x", alpha=0.3, lookback=199, out_col="e1")
    trunc = ewma(df, "k", "i", "x", alpha=0.3, lookback=40, out_col="e2")
    j = full.select("i", "e1").join(trunc.select("i", "e2"), "i")
    diff = j.agg(F.max(F.abs(F.col("e1") - F.col("e2")))).first()[0]
    assert diff <= 1e-4


# ---------------------------------------------------------------- bfs

def test_bfs_hops_line_graph(spark):
    from niamoto_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
        "id_a int, id_b int")
    seeds = spark.createDataFrame([(1,)], "node_id int")
    out = {r.node_id: r.hops
           for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond max_hops; 10/11
    #                                          unreachable


def test_bfs_multi_source_min_distance(spark):
    from niamoto_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a int, id_b int")
    seeds = spark.createDataFrame([(1,), (5,)], "node_id int")
    out = {r.node_id: r.hops
           for r in bfs_hops(edges, seeds, max_hops=4).collect()}
    assert out == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_directed(spark):
    from niamoto_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([(1, 2), (3, 2)], "id_a int, id_b int")
    seeds = spark.createDataFrame([(1,)], "node_id int")
    out = {r.node_id: r.hops
           for r in bfs_hops(edges, seeds, max_hops=3,
                             directed=True).collect()}
    assert out == {1: 0, 2: 1}  # 3 not reachable along edge direction


# ---------------------------------------------------------------- pareto

def _naive_skyline(pts, signs):
    def dom(y, x):
        ge = all(sy * yv >= sy * xv
                 for (yv, xv, sy) in zip(y, x, signs))
        gt = any(sy * yv > sy * xv
                 for (yv, xv, sy) in zip(y, x, signs))
        return ge and gt
    return {tuple(x) for x in pts
            if not any(dom(y, x) for y in pts if y != x)}


def test_pareto_matches_naive(spark):
    import random

    from niamoto_spark.operators.pareto import pareto_frontier

    rng = random.Random(7)
    pts = [(rng.randint(0, 50), rng.randint(0, 50), rng.randint(0, 50))
           for _ in range(300)]
    df = (spark.createDataFrame(pts, "x int, y int, z int")
          .repartition(7))
    out = pareto_frontier(df, {"x": "min", "y": "max", "z": "max"})
    got = {(r.x, r.y, r.z) for r in out.collect()}
    ref = _naive_skyline([list(p) for p in pts], [-1, 1, 1])
    assert got == ref


def test_pareto_duplicates_survive(spark):
    from niamoto_spark.operators.pareto import pareto_frontier

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 1, "b"), (0, 0, "c")], "x int, y int, tag string")
    out = pareto_frontier(df, {"x": "max", "y": "max"})
    assert {r.tag for r in out.collect()} == {"a", "b"}


def test_pareto_bad_direction_raises(spark):
    from niamoto_spark.operators.pareto import pareto_frontier

    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        pareto_frontier(df, {"x": "upwards"})


# ---------------------------------------------------------------- benford

def test_benford_digits_and_fractions(spark):
    from niamoto_spark.operators.quality import benford_audit

    vals = [1.0, 12.0, 150.0, 2.0, 25.0, 3.0, 0.0, None, -4.5, 0.019]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.digit: r for r in benford_audit(df, "x").collect()}
    # digits: 1,1,1,2,2,3,4,1  (0/None excluded; -4.5 -> 4; 0.019 -> 1)
    assert out[1].n == 4 and out[2].n == 2 and out[3].n == 1
    assert out[4].n == 1
    assert out[1].observed == pytest.approx(0.5)
    assert out[1].expected == pytest.approx(round(math.log10(2), 4))
    total = sum(r.observed for r in out.values())
    assert total == pytest.approx(1.0, abs=1e-3)


# ------------------------------------------------------------- fingerprint

def test_fingerprint_order_and_partition_invariant(spark):
    from niamoto_spark.operators.quality import table_fingerprint

    rows = [(i, f"name{i}", i % 5) for i in range(100)]
    a = spark.createDataFrame(rows, "id int, name string, seg int")
    b = (spark.createDataFrame(list(reversed(rows)),
                               "id int, name string, seg int")
         .repartition(13))
    fa = table_fingerprint(a).first()
    fb = table_fingerprint(b).first()
    assert (fa.n_rows, fa.xor_fp, fa.sum_fp) == \
           (fb.n_rows, fb.xor_fp, fb.sum_fp)


def test_fingerprint_detects_single_cell_change(spark):
    from niamoto_spark.operators.quality import table_fingerprint

    rows = [(i, f"name{i}") for i in range(50)]
    a = spark.createDataFrame(rows, "id int, name string")
    rows2 = list(rows)
    rows2[17] = (17, "NAME17")
    b = spark.createDataFrame(rows2, "id int, name string")
    fa, fb = table_fingerprint(a).first(), table_fingerprint(b).first()
    assert fa.n_rows == fb.n_rows
    assert (fa.xor_fp, fa.sum_fp) != (fb.xor_fp, fb.sum_fp)


def test_fingerprint_duplicate_row_pair_detected(spark):
    from niamoto_spark.operators.quality import table_fingerprint

    # two extra copies of the same row cancel in XOR — the DECIMAL sum
    # still catches them (the reason the fingerprint has two aggregates)
    base = [(1, "a"), (2, "b")]
    a = spark.createDataFrame(base, "id int, name string")
    b = spark.createDataFrame(base + [(1, "a"), (1, "a")],
                              "id int, name string")
    fa, fb = table_fingerprint(a).first(), table_fingerprint(b).first()
    assert fa.xor_fp == fb.xor_fp          # XOR blind spot, by design
    assert fa.sum_fp != fb.sum_fp          # sum catches it
    assert fa.n_rows != fb.n_rows


# --- sequence_pairs / l_diversity / skew_report ----------------------------

def test_sequence_pairs_window_and_once_per_user(spark):
    from niamoto_spark.operators.itemsets import sequence_pairs
    rows = [
        (1, 0, "view"), (1, 10, "cart"), (1, 20, "cart"),   # view->cart once
        (2, 0, "view"), (2, 500, "cart"),                   # outside window
        (3, 0, "view"), (3, 30, "cart"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, ty string")
    out = {(r["type_a"], r["type_b"]): r for r in
           sequence_pairs(df, "u", "t", "ty", window_s=60,
                          min_users=1).collect()}
    # user 1 counted once despite two qualifying cart events
    assert out[("view", "cart")]["n_users"] == 2
    assert out[("view", "cart")]["support"] == pytest.approx(2 / 3)
    # order matters: cart->view never happened
    assert ("cart", "view") not in out


def test_sequence_pairs_drops_viral_users(spark):
    from niamoto_spark.operators.itemsets import sequence_pairs
    rows = ([(1, t, "a") for t in range(20)]
            + [(2, 0, "a"), (2, 1, "b")])
    df = spark.createDataFrame(rows, "u long, t long, ty string")
    out = sequence_pairs(df, "u", "t", "ty", window_s=60,
                         min_users=1, max_user_events=10).collect()
    # user 1 dropped whole; denominator is retained users (1)
    assert {(r["type_a"], r["type_b"], r["n_users"], r["support"])
            for r in out} == {("a", "b", 1, 1.0)}


def test_l_diversity_flags_homogeneous_group(spark):
    from niamoto_spark.operators.quality import l_diversity
    rows = [("g1", "x"), ("g1", "x"), ("g1", "x"),   # big but l=1
            ("g2", "x"), ("g2", "y")]
    df = spark.createDataFrame(rows, "q string, s string")
    out = {r["l"]: r for r in l_diversity(df, ["q"], "s").collect()}
    assert out[1]["n_groups"] == 1 and out[1]["n_rows"] == 3
    assert out[2]["n_groups"] == 1 and out[2]["min_group_size"] == 2


def test_skew_report_ratio_and_order(spark):
    from niamoto_spark.operators.skew import skew_report
    rows = [("hot",)] * 8 + [("a",)] * 1 + [("b",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k", top_k=2).collect()
    assert [r["key"] for r in out] == ["hot", "a"]  # count desc, key asc
    assert out[0]["share"] == pytest.approx(0.8)
    # max=8, avg=10/3 -> ratio 2.4
    assert out[0]["skew_ratio"] == pytest.approx(2.4)
    assert out[0]["n_keys"] == 3


def test_readability_hand_computed(spark):
    from niamoto_spark.operators.text import readability
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "   ")],
        "id long, text string")
    out = {r["id"]: r for r in readability(df, "text").collect()}
    r = out[1]
    # words=6, sentences=2, syllable groups: e,a,a,e,o,a -> 6
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    expect = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert r["flesch"] == pytest.approx(round(expect, 4))
    assert out[2]["flesch"] is None


def test_sampled_group_count_deterministic_and_scaled(spark):
    from niamoto_spark.operators.sketches import sampled_group_count
    df = spark.range(0, 2000).withColumn(
        "g", (F.col("id") % 2 == 0).cast("string"))
    a = sampled_group_count(df, ["g"], "id", frac=0.2).collect()
    b = sampled_group_count(df, ["g"], "id", frac=0.2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    for r in a:
        assert r["est_count"] == pytest.approx(r["n_sampled"] / 0.2)
        # HT estimate lands near the true 1000 per group
        assert 600 < r["est_count"] < 1400


def test_gazetteer_tag_counts(spark):
    from niamoto_spark.operators.text import gazetteer_tag
    docs = spark.createDataFrame(
        [(1, "Data, data everywhere - the MODEL works"),
         (2, "no relevant words here")],
        "doc_id long, text string")
    gaz = spark.createDataFrame(
        [("data", "TECH"), ("model", "TECH")], "term string, tag string")
    out = {(r["id"], r["tag"]): r
           for r in gazetteer_tag(docs, "doc_id", "text", gaz).collect()}
    assert out[(1, "TECH")]["n_hits"] == 3     # data x2 + model
    assert out[(1, "TECH")]["n_terms"] == 2
    assert (2, "TECH") not in out


def test_sequence_pairs_and_overlap_plans_no_cartesian(spark):
    from niamoto_spark.operators.interval import interval_overlap_join
    from niamoto_spark.operators.itemsets import sequence_pairs
    from niamoto_spark.operators.recsys import audience_overlap

    ev = spark.createDataFrame(
        [(i % 50, i, "t%d" % (i % 3)) for i in range(500)],
        "u long, t long, ty string")
    sp = sequence_pairs(ev, "u", "t", "ty", window_s=10, min_users=1)
    plan = sp._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    m = spark.createDataFrame(
        [(i % 40, "s%d" % (i % 4)) for i in range(400)],
        "u long, s string")
    ao = audience_overlap(m, "u", "s")
    plan = ao._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    l = spark.createDataFrame([(1, 0, 10), (2, 5, 9)],
                              "k long, l_start long, l_end long")
    r = spark.createDataFrame([(1, 5, 15), (2, 20, 30)],
                              "k long, r_start long, r_end long")
    j = interval_overlap_join(l, r, "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert j.count() == 1  # only key 1 overlaps
