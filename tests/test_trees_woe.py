"""stump_split (operators/trees.py) and woe_iv (operators/features.py):
hand-computable fixtures where the optimal split / WOE table is known
in closed form."""

import math

import pytest

from niamoto_spark.operators.features import woe_iv
from niamoto_spark.operators.trees import stump_split


def test_stump_finds_perfect_split(spark):
    # y = 1 exactly when x >= 50: a clean threshold mid-range
    rows = [(float(x), 1 if x >= 50 else 0) for x in range(100)]
    df = spark.createDataFrame(rows, "x double, y int")
    out = stump_split(df, ["x"], "y", n_bins=10).collect()
    assert len(out) == 1
    r = out[0]
    # bins are width 9.9 over [0, 99]; x=50 starts in bin 5, so the
    # best boundary is after bin 4 (rows 0..49 left)
    assert r["split_bin"] == 4
    assert r["n_left"] == 50 and r["n_right"] == 50
    # perfect separation: gain == parent gini == 0.5
    assert r["gain"] == pytest.approx(0.5, abs=1e-9)
    assert r["threshold"] == pytest.approx(0.0 + 5 * 9.9, abs=1e-6)


def test_stump_constant_feature_sentinel(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0, 0), (2.0, 5.0, 1), (3.0, 5.0, 1)],
        "a double, c double, y int")
    out = {r["feature"]: r for r in
           stump_split(df, ["a", "c"], "y", n_bins=4).collect()}
    assert out["c"]["split_bin"] == -1 and out["c"]["gain"] == 0.0
    assert out["a"]["split_bin"] == 0  # split after first bin: {1} | {2,3}
    assert out["a"]["n_left"] == 1


def test_stump_gain_matches_hand_gini(spark):
    # 8 rows, feature in {0,1,2,3} x2, y pattern with an imperfect split
    rows = [(0.0, 0), (0.0, 0), (1.0, 0), (1.0, 1),
            (2.0, 1), (2.0, 1), (3.0, 1), (3.0, 0)]
    df = spark.createDataFrame(rows, "x double, y int")
    r = stump_split(df, ["x"], "y", n_bins=4).collect()[0]

    def gini(n, e):
        return 1 - (e / n) ** 2 - ((n - e) / n) ** 2 if n else 0.0

    # candidates: split after bin 0/1/2.  After 0: (2 rows, 0 ev) |
    # (6 rows, 4 ev) -> 1/6; after 1: 0.125; after 2 mirrors bin 0.
    # Tie between bins 0 and 2 breaks toward the smaller bin.
    expect = gini(8, 4) - (2 / 8 * gini(2, 0) + 6 / 8 * gini(6, 4))
    assert r["split_bin"] == 0
    assert r["n_left"] == 2 and r["n_right"] == 6
    assert r["gain"] == pytest.approx(round(expect, 8), abs=1e-9)


def test_woe_iv_hand_computed(spark):
    # two bins: A (3 rows, 2 events), B (5 rows, 1 event)
    rows = [("A", 1), ("A", 1), ("A", 0),
            ("B", 1), ("B", 0), ("B", 0), ("B", 0), ("B", 0)]
    df = spark.createDataFrame(rows, "bin string, y int")
    out = {r["bin"]: r for r in woe_iv(df, "bin", "y").collect()}
    s, E, NE = 0.5, 3.0, 5.0
    pe_a, pne_a = (2 + s) / (E + 1), (1 + s) / (NE + 1)
    pe_b, pne_b = (1 + s) / (E + 1), (4 + s) / (NE + 1)
    woe_a = math.log(pe_a / pne_a)
    woe_b = math.log(pe_b / pne_b)
    iv = (pe_a - pne_a) * woe_a + (pe_b - pne_b) * woe_b
    assert out["A"]["woe"] == pytest.approx(woe_a, abs=1e-6)
    assert out["B"]["woe"] == pytest.approx(woe_b, abs=1e-6)
    assert out["A"]["iv"] == pytest.approx(iv, abs=1e-6)
    assert out["A"]["iv"] == out["B"]["iv"]
    assert out["A"]["n"] == 3 and out["A"]["events"] == 2


def test_woe_iv_empty_bin_never_div0(spark):
    # a bin with zero events still gets a finite WOE (smoothing)
    rows = [("A", 1), ("A", 1), ("B", 0), ("B", 0)]
    df = spark.createDataFrame(rows, "bin string, y int")
    out = {r["bin"]: r for r in woe_iv(df, "bin", "y").collect()}
    assert all(math.isfinite(r["woe"]) for r in out.values())
    assert out["B"]["events"] == 0


def test_boosted_stumps_reduce_mse_monotonically(spark):
    from niamoto_spark.operators.trees import boosted_stumps
    # y = 1 when x >= 50: one stump nearly solves it, boosting refines
    rows = [(float(x), float(x % 7) / 7.0, 1 if x >= 50 else 0)
            for x in range(100)]
    df = spark.createDataFrame(rows, "x double, z double, y int")
    model = boosted_stumps(df, ["x", "z"], "y", rounds=3,
                           learning_rate=0.8, n_bins=10).collect()
    assert len(model) == 3
    assert model[0]["feature"] == "x"          # the signal feature
    assert model[0]["split_bin"] == 4          # boundary before x=50

    def predict(x, z):
        p = model[0]["base_score"]
        for m in model:
            v = x if m["feature"] == "x" else z
            # reconstruct bin from threshold algebra (10 equal bins)
            edge = m["threshold"]
            p += m["left_step"] if v <= edge + 1e-9 else m["right_step"]
        return p

    mse = sum((predict(x, (x % 7) / 7.0) - (1 if x >= 50 else 0)) ** 2
              for x in range(100)) / 100
    base_mse = 0.5 * 0.5  # predicting the mean
    assert mse < base_mse / 3


def test_boosted_stumps_deterministic(spark):
    from niamoto_spark.operators.trees import boosted_stumps
    rows = [(float(x % 13), float(x % 5), x % 3 == 0)
            for x in range(200)]
    df = spark.createDataFrame(rows, "a double, b double, y boolean")
    m1 = [tuple(r) for r in boosted_stumps(
        df, ["a", "b"], "y", rounds=2).collect()]
    m2 = [tuple(r) for r in boosted_stumps(
        df.repartition(7), ["a", "b"], "y", rounds=2).collect()]
    assert m1 == m2                            # partition-invariant


def test_stump_split_plan_has_no_join(spark):
    """The histogram pass must be a single Expand + aggregation —
    never a join or second scan per feature."""
    from niamoto_spark.operators.trees import stump_split
    df = spark.range(0, 1000).selectExpr(
        "CAST(id % 97 AS DOUBLE) AS a", "CAST(id % 31 AS DOUBLE) AS b",
        "CAST(id % 2 AS INT) AS y")
    out = stump_split(df, ["a", "b"], "y", n_bins=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the per-feature fan-out is one Generate (explode) — not a join,
    # not one scan per feature
    assert "Generate explode" in plan or "Expand" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan
