"""cap_per_group (text.py), seasonal_residuals (timeseries.py),
ab_proportion_test / ab_mean_test (experiments.py)."""

import math

import pytest
from pyspark.sql import functions as F


class TestCapPerGroup:
    def test_cap_enforced_and_stable(self, spark):
        from niamoto_spark.operators.text import cap_per_group

        df = spark.createDataFrame(
            [(f"s{i % 3}", i) for i in range(60)],
            "src string, id long")
        kept = cap_per_group(df, "src", "id", cap=5)
        sizes = {r["src"]: r["n"] for r in
                 kept.groupBy("src").agg(F.count("*").alias("n"))
                 .collect()}
        assert sizes == {"s0": 5, "s1": 5, "s2": 5}
        # deterministic: same call -> same rows
        a = {tuple(r) for r in kept.collect()}
        b = {tuple(r) for r in
             cap_per_group(df, "src", "id", cap=5).collect()}
        assert a == b

    def test_groups_below_cap_untouched(self, spark):
        from niamoto_spark.operators.text import cap_per_group

        df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)],
                                   "src string, id long")
        assert cap_per_group(df, "src", "id", cap=10).count() == 3

    def test_seed_redeals(self, spark):
        from niamoto_spark.operators.text import cap_per_group

        df = spark.createDataFrame([("a", i) for i in range(100)],
                                   "src string, id long")
        s1 = {r["id"] for r in
              cap_per_group(df, "src", "id", 10, seed="x").collect()}
        s2 = {r["id"] for r in
              cap_per_group(df, "src", "id", 10, seed="y").collect()}
        assert s1 != s2  # 100-choose-10 collision is astronomically unlikely


class TestSeasonalResiduals:
    def test_profile_and_flags(self, spark):
        from niamoto_spark.operators.timeseries import seasonal_residuals

        rows = ([(0, 10.0)] * 9 + [(0, 110.0)]  # hour 0: one spike
                + [(1, 5.0)] * 10)              # hour 1: constant
        df = spark.createDataFrame(rows, "hod int, v double")
        out = seasonal_residuals(df, "hod", "v", z_threshold=2.5)
        spike = out.where(F.col("v") == 110.0).first()
        assert spike["season_mean"] == pytest.approx(20.0)
        assert spike["is_anomaly"]
        # constant season: sigma 0 -> z defined as 0, never anomalous
        h1 = out.where(F.col("hod") == 1).collect()
        assert all(r["seasonal_z"] == 0.0 and not r["is_anomaly"]
                   for r in h1)

    def test_z_matches_hand_algebra(self, spark):
        from niamoto_spark.operators.timeseries import seasonal_residuals

        df = spark.createDataFrame(
            [(0, 1.0), (0, 2.0), (0, 3.0)], "hod int, v double")
        rows = {r["v"]: r["seasonal_z"] for r in
                seasonal_residuals(df, "hod", "v").collect()}
        sigma = math.sqrt(2 / 3)  # population stddev of {1,2,3}
        assert rows[3.0] == pytest.approx(1.0 / sigma, abs=1e-12)


class TestAbTests:
    def test_proportion_z_hand_computed(self, spark):
        from niamoto_spark.operators.experiments import (
            ab_proportion_test)

        rows = ([("control", 1)] * 30 + [("control", 0)] * 70
                + [("treatment", 1)] * 40 + [("treatment", 0)] * 60)
        df = spark.createDataFrame(rows, "variant string, conv int")
        r = ab_proportion_test(df, "variant", "conv",
                               "control", "treatment").first()
        assert (r["n_c"], r["n_t"]) == (100, 100)
        assert r["rate_c"] == pytest.approx(0.3)
        assert r["rate_t"] == pytest.approx(0.4)
        pool = 0.35
        se = math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
        assert r["z"] == pytest.approx(0.1 / se, abs=1e-12)

    def test_mean_z_welch(self, spark):
        from niamoto_spark.operators.experiments import ab_mean_test

        rows = ([("control", v) for v in (1.0, 2.0, 3.0)]
                + [("treatment", v) for v in (4.0, 5.0, 6.0)])
        df = spark.createDataFrame(rows, "variant string, v double")
        r = ab_mean_test(df, "variant", "v",
                         "control", "treatment").first()
        v = 2 / 3  # var_pop of each side
        assert r["diff"] == pytest.approx(3.0)
        assert r["z"] == pytest.approx(3.0 / math.sqrt(2 * v / 3),
                                       abs=1e-12)

    def test_other_variants_ignored(self, spark):
        from niamoto_spark.operators.experiments import (
            ab_proportion_test)

        df = spark.createDataFrame(
            [("control", 1), ("treatment", 0), ("holdout", 1)],
            "variant string, conv int")
        r = ab_proportion_test(df, "variant", "conv",
                               "control", "treatment").first()
        assert (r["n_c"], r["n_t"]) == (1, 1)

    def test_zero_variance_z_is_zero(self, spark):
        from niamoto_spark.operators.experiments import (
            ab_proportion_test)

        df = spark.createDataFrame(
            [("control", 0), ("treatment", 0)],
            "variant string, conv int")
        assert ab_proportion_test(
            df, "variant", "conv", "control", "treatment"
        ).first()["z"] == 0.0
