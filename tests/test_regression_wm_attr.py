"""ols_fit2 (regression.py), weighted_median (cleaning.py),
position_attribution (timeseries.py)."""

import pytest
from pyspark.sql import functions as F


class TestOlsFit2:
    def test_exact_plane_recovered(self, spark):
        """y = 2 + 3*x1 - 5*x2 exactly -> coefficients recovered, r2=1."""
        from niamoto_spark.operators.regression import ols_fit2

        rows = [("g", float(x1), float(x2),
                 float(2 + 3 * x1 - 5 * x2))
                for x1 in range(10) for x2 in range(5)]
        df = spark.createDataFrame(rows,
                                   "g string, x1 double, x2 double, "
                                   "y double")
        r = ols_fit2(df, "y", "x1", "x2", "g").first()
        assert r["b0"] == pytest.approx(2.0, abs=1e-4)
        assert r["b1"] == pytest.approx(3.0, abs=1e-4)
        assert r["b2"] == pytest.approx(-5.0, abs=1e-4)
        assert r["r2"] == pytest.approx(1.0, abs=1e-6)

    def test_matches_numpy_lstsq(self, spark):
        import numpy as np

        from niamoto_spark.operators.regression import ols_fit2

        rng = np.random.RandomState(5)
        x1 = rng.uniform(0, 10, 200)
        x2 = rng.uniform(-3, 3, 200)
        y = 1.5 + 0.7 * x1 - 2.1 * x2 + rng.normal(0, 0.5, 200)
        df = spark.createDataFrame(
            [("g", float(a), float(b), float(c))
             for a, b, c in zip(x1, x2, y)],
            "g string, x1 double, x2 double, y double")
        r = ols_fit2(df, "y", "x1", "x2", "g", round_dp=8).first()
        X = np.column_stack([np.ones_like(x1), x1, x2])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        assert r["b0"] == pytest.approx(beta[0], abs=1e-6)
        assert r["b1"] == pytest.approx(beta[1], abs=1e-6)
        assert r["b2"] == pytest.approx(beta[2], abs=1e-6)

    def test_ridge_shrinks_coefficients(self, spark):
        from niamoto_spark.operators.regression import ols_fit2

        rows = [("g", float(i), float(i % 7), float(2 * i))
                for i in range(50)]
        df = spark.createDataFrame(rows,
                                   "g string, x1 double, x2 double, "
                                   "y double")
        plain = ols_fit2(df, "y", "x1", "x2", "g").first()
        shrunk = ols_fit2(df, "y", "x1", "x2", "g",
                          ridge=1000.0).first()
        assert abs(shrunk["b1"]) < abs(plain["b1"])

    def test_groups_independent(self, spark):
        from niamoto_spark.operators.regression import ols_fit2

        rows = ([("a", float(i), float(i % 3), float(i))
                 for i in range(10)]
                + [("b", float(i), float(i % 3), float(-i))
                   for i in range(10)])
        df = spark.createDataFrame(rows,
                                   "g string, x1 double, x2 double, "
                                   "y double")
        got = {r["g"]: r["b1"] for r in
               ols_fit2(df, "y", "x1", "x2", "g").collect()}
        assert got["a"] == pytest.approx(1.0, abs=1e-4)
        assert got["b"] == pytest.approx(-1.0, abs=1e-4)


class TestWeightedMedian:
    def test_hand_computed(self, spark):
        from niamoto_spark.operators.cleaning import weighted_median

        # values 1(w1), 2(w1), 3(w10): half total = 6 -> median 3
        df = spark.createDataFrame(
            [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0)],
            "g string, v double, w double")
        r = weighted_median(df, "v", "w", "g").first()
        assert r["weighted_median"] == 3.0
        assert r["total_weight"] == 12.0

    def test_unit_weights_match_lower_median(self, spark):
        from niamoto_spark.operators.cleaning import weighted_median

        df = spark.createDataFrame(
            [("g", float(v), 1.0) for v in (5, 1, 3, 2, 4)],
            "g string, v double, w double")
        assert weighted_median(df, "v", "w", "g") \
            .first()["weighted_median"] == 3.0

    def test_duplicate_values_collapse(self, spark):
        from niamoto_spark.operators.cleaning import weighted_median

        df = spark.createDataFrame(
            [("g", 1.0, 3.0), ("g", 1.0, 3.0), ("g", 9.0, 1.0)],
            "g string, v double, w double")
        assert weighted_median(df, "v", "w", "g") \
            .first()["weighted_median"] == 1.0


class TestPositionAttribution:
    def _run(self, spark, rows):
        from niamoto_spark.operators.timeseries import (
            position_attribution)

        df = spark.createDataFrame(rows,
                                   "u long, o long, ch string")
        return {r["channel"]: r["credit"] for r in
                position_attribution(
                    df, "u", "o", "ch",
                    F.col("ch") == "buy").collect()}

    def test_u_shape_four_touches(self, spark):
        got = self._run(spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
                                (1, 4, "d"), (1, 5, "buy")])
        assert got["a"] == pytest.approx(0.4)
        assert got["d"] == pytest.approx(0.4)
        assert got["b"] == pytest.approx(0.1)
        assert got["c"] == pytest.approx(0.1)

    def test_single_touch_full_credit(self, spark):
        got = self._run(spark, [(1, 1, "a"), (1, 2, "buy")])
        assert got["a"] == pytest.approx(1.0)

    def test_two_touches_split(self, spark):
        got = self._run(spark, [(1, 1, "a"), (1, 2, "b"),
                                (1, 3, "buy")])
        assert got["a"] == pytest.approx(0.5)
        assert got["b"] == pytest.approx(0.5)

    def test_touches_after_conversion_ignored(self, spark):
        got = self._run(spark, [(1, 1, "a"), (1, 2, "buy"),
                                (1, 3, "late")])
        assert "late" not in got

    def test_non_converters_excluded(self, spark):
        got = self._run(spark, [(1, 1, "a"), (2, 1, "b"),
                                (1, 2, "buy")])
        assert got == {"a": pytest.approx(1.0)}

    def test_singular_design_returns_null_not_error(self, spark):
        from niamoto_spark.operators.regression import ols_fit2

        # x2 constant -> singular normal equations without ridge
        rows = [("g", float(i), 0.5, float(i)) for i in range(10)]
        df = spark.createDataFrame(rows,
                                   "g string, x1 double, x2 double, "
                                   "y double")
        r = ols_fit2(df, "y", "x1", "x2", "g").first()
        assert r["b1"] is None and r["b2"] is None
        # ridge regularizes it back to solvable
        r2 = ols_fit2(df, "y", "x1", "x2", "g", ridge=1.0).first()
        assert r2["b1"] is not None
