"""histogram_quantiles (operators/sketches.py) and rrf_fuse
(operators/retrieval.py)."""

import pytest


class TestHistogramQuantiles:
    def test_uniform_grid_estimates(self, spark):
        from niamoto_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame([(float(i),) for i in range(1000)],
                                   "v double")
        got = {r["q"]: r["estimate"] for r in
               histogram_quantiles(df, "v", n_bins=100,
                                   qs=(0.5, 0.9)).collect()}
        # estimate = lower edge of the reaching bin, so it can sit up
        # to one bin width (~9.99) below the true quantile
        assert got[0.5] == pytest.approx(500, abs=11)
        assert got[0.9] == pytest.approx(900, abs=11)

    def test_error_bounded_by_bin_width(self, spark):
        import random

        from niamoto_spark.operators.sketches import histogram_quantiles

        rng = random.Random(3)
        vals = sorted(rng.uniform(0, 100) for _ in range(2000))
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        width = (vals[-1] - vals[0]) / 64
        got = {r["q"]: r["estimate"] for r in
               histogram_quantiles(df, "v", n_bins=64,
                                   qs=(0.25, 0.5, 0.75)).collect()}
        for q, est in got.items():
            true = vals[int(q * 2000) - 1]
            assert abs(est - true) <= width + 1e-9

    def test_constant_column(self, spark):
        from niamoto_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame([(5.0,)] * 10, "v double")
        rows = histogram_quantiles(df, "v", n_bins=8,
                                   qs=(0.5,)).collect()
        assert rows[0]["estimate"] == 5.0

    def test_sketch_merges_additively(self, spark):
        """Quantiles of the union == quantiles from summed bin counts:
        verified by running on the union vs each half separately and
        checking the union estimate falls between per-half ones is NOT
        the property — additivity is exact, so just compare to the
        full-data run after a shuffled split."""
        from niamoto_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame([(float(i % 500),)
                                    for i in range(3000)], "v double")
        full = {r["q"]: r["estimate"] for r in
                histogram_quantiles(df, "v", n_bins=32,
                                    qs=(0.5,)).collect()}
        rep = {r["q"]: r["estimate"] for r in
               histogram_quantiles(df.repartition(17), "v", n_bins=32,
                                   qs=(0.5,)).collect()}
        assert full == rep  # partition-invariant = mergeable


class TestRrfFuse:
    def _rank(self, spark, rows):
        return spark.createDataFrame(rows,
                                     "query_id string, doc_id long, "
                                     "rank int")

    def test_agreeing_doc_wins(self, spark):
        from niamoto_spark.operators.retrieval import rrf_fuse

        a = self._rank(spark, [("q", 1, 1), ("q", 2, 2)])
        b = self._rank(spark, [("q", 2, 1), ("q", 3, 2)])
        out = {r["doc_id"]: r for r in
               rrf_fuse([a, b], topk=3).collect()}
        # doc 2 appears in both lists -> highest fused score
        assert out[2]["fused_rank"] == 1
        assert out[2]["n_lists"] == 2
        assert out[2]["rrf"] == pytest.approx(
            round(1 / 61 + 1 / 62, 6))

    def test_absent_doc_contributes_nothing(self, spark):
        from niamoto_spark.operators.retrieval import rrf_fuse

        a = self._rank(spark, [("q", 1, 1)])
        b = self._rank(spark, [("q", 2, 1)])
        out = {r["doc_id"]: r["rrf"] for r in
               rrf_fuse([a, b]).collect()}
        assert out[1] == out[2] == pytest.approx(round(1 / 61, 6))

    def test_queries_fused_independently(self, spark):
        from niamoto_spark.operators.retrieval import rrf_fuse

        a = self._rank(spark, [("q1", 1, 1), ("q2", 9, 1)])
        out = {(r["query_id"], r["doc_id"]): r["fused_rank"]
               for r in rrf_fuse([a]).collect()}
        assert out[("q1", 1)] == 1 and out[("q2", 9)] == 1

    def test_topk_and_tiebreak(self, spark):
        from niamoto_spark.operators.retrieval import rrf_fuse

        a = self._rank(spark, [("q", d, 1) for d in (5, 3, 9)])
        rows = rrf_fuse([a], topk=2).collect()
        # identical scores -> tiebreak by doc id ascending
        assert [r["doc_id"] for r in
                sorted(rows, key=lambda r: r["fused_rank"])] == [3, 5]


# --- ALS factorization -----------------------------------------------------

def _als_reference(ratings, k, iters, reg):
    """Driver-side numpy replica of als_factorize's exact update rule."""
    import numpy as np
    users = sorted({u for u, _, _ in ratings})
    items = sorted({i for _, i, _ in ratings})
    by_item = {i: [(u, r) for u, i2, r in ratings if i2 == i]
               for i in items}
    by_user = {u: [(i, r) for u2, i, r in ratings if u2 == u]
               for u in users}
    V = {}
    for i in items:
        rs = [r for _, r in by_item[i]]
        V[i] = np.array([np.mean(rs)] + [0.1] * (k - 1))
    U = {}
    for _ in range(iters):
        for u in users:
            A = reg * np.eye(k)
            b = np.zeros(k)
            for i, r in by_user[u]:
                A += np.outer(V[i], V[i])
                b += r * V[i]
            U[u] = np.linalg.solve(A, b)
        for i in items:
            A = reg * np.eye(k)
            b = np.zeros(k)
            for u, r in by_item[i]:
                A += np.outer(U[u], U[u])
                b += r * U[u]
            V[i] = np.linalg.solve(A, b)
    return U, V


def test_als_rank2_matches_numpy_reference(spark):
    import numpy as np

    from niamoto_spark.operators.recsys import als_factorize

    ratings = [(1, 10, 5.0), (1, 11, 1.0), (2, 10, 4.0),
               (2, 12, 2.0), (3, 11, 5.0), (3, 12, 3.0)]
    df = spark.createDataFrame(ratings, "u long, i long, r double")
    users, items = als_factorize(df, "u", "i", "r", rank=2, iters=2)
    U, V = _als_reference(ratings, k=2, iters=2, reg=0.1)
    got_u = {r["id"]: r["factors"] for r in users.collect()}
    got_v = {r["id"]: r["factors"] for r in items.collect()}
    for u in U:
        np.testing.assert_allclose(got_u[u], U[u], atol=1e-5)
    for i in V:
        np.testing.assert_allclose(got_v[i], V[i], atol=1e-5)


def test_als_rank1_reduces_reconstruction_error(spark):
    import numpy as np

    from niamoto_spark.operators.recsys import als_factorize

    # rank-1 structure: r = a_u * b_i exactly
    a = {1: 1.0, 2: 2.0, 3: 3.0}
    b = {10: 2.0, 11: 1.0, 12: 0.5}
    ratings = [(u, i, a[u] * b[i]) for u in a for i in b]
    df = spark.createDataFrame(ratings, "u long, i long, r double")
    users, items = als_factorize(df, "u", "i", "r", rank=1, iters=3,
                                 reg=0.01)
    gu = {r["id"]: r["factors"][0] for r in users.collect()}
    gv = {r["id"]: r["factors"][0] for r in items.collect()}
    errs = [abs(gu[u] * gv[i] - a[u] * b[i]) for u in a for i in b]
    assert np.mean(errs) < 0.05


def test_robust_slope_ignores_outliers(spark):
    from niamoto_spark.operators.regression import robust_slope
    # y = 3x + 2 with two wild outliers OLS would chase
    rows = [(float(x), 3.0 * x + 2.0, x) for x in range(50)]
    rows += [(25.5, 10000.0, 990), (26.5, -8000.0, 991)]
    df = spark.createDataFrame(rows, "x double, y double, id long")
    r = robust_slope(df, "x", "y", ["id"]).collect()[0]
    assert r["slope"] == pytest.approx(3.0, abs=0.1)
    assert r["intercept"] == pytest.approx(2.0, abs=3.0)
    assert r["n"] == 52
