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

    def test_permutation_seed_changes_null_draws(self, spark):
        """ADVICE r7: the seed parameter was accepted but never folded
        into the md5 coin, so every seed replayed the same
        permutations (and correlated with other md5(id)-keyed
        operators).  Pinned: deterministic per seed, different across
        seeds (values verified on this fixed fixture)."""
        from niamoto_spark.operators.experiments import permutation_test

        rows = [(i, "T" if i % 2 == 0 else "C", float(v))
                for i, v in enumerate([1, 2, 3, 4, 100, 6, 7, 8, 9, 10])]
        df = spark.createDataFrame(rows, "id long, arm string, v double")

        def n_ge(seed):
            return permutation_test(df, "arm", "v", "id", treatment="T",
                                    n_perms=19, seed=seed).first()["n_ge"]

        assert n_ge("perm") == n_ge("perm") == 6   # deterministic
        assert n_ge("a") == 9 and n_ge("b") == 7   # seed matters

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


# --- stl_decompose / conformal_interval / uplift_by_segment ----------------

def test_stl_recovers_planted_seasonality(spark):
    from niamoto_spark.operators.timeseries import stl_decompose
    # flat trend 100 + weekly bump of +7 on phase 0, 28 days
    rows = [("s", d, 100.0 + (7.0 if d % 7 == 0 else 0.0))
            for d in range(28)]
    df = spark.createDataFrame(rows, "k string, day long, v double")
    out = {r["day"]: r for r in
           stl_decompose(df, "k", "day", "v", period=7,
                         trend_window=3).collect()}
    # interior phase-0 day: seasonal component captures most of the
    # bump, residual is small
    assert out[14]["seasonal"] > 4.0
    assert abs(out[14]["residual"]) < 2.0
    # seasonal sums to ~0 across one period of interior days
    s = sum(out[d]["seasonal"] for d in range(7, 14))
    assert abs(s) < 1.0


def test_conformal_coverage_guarantee(spark):
    import pyspark.sql.functions as F
    from niamoto_spark.operators.mleval import conformal_interval
    # pred = 0, actual = id % 100: residuals uniform on 0..99
    df = (spark.range(0, 2000)
          .withColumn("pred", F.lit(0.0))
          .withColumn("actual", (F.col("id") % 100).cast("double")))
    r = conformal_interval(df, "pred", "actual", "id",
                           alpha=0.2).collect()[0]
    assert r["n_cal"] + r["n_test"] == 2000
    # the 80th-percentile-ish residual and coverage >= 1 - alpha - noise
    assert 70 <= r["qhat"] <= 90
    assert r["coverage"] >= 0.75


def test_uplift_by_segment_hand_counts(spark):
    from niamoto_spark.operators.experiments import uplift_by_segment
    rows = [("T", "a", 1), ("T", "a", 1), ("C", "a", 0), ("C", "a", 1),
            ("T", "b", 0), ("C", "b", 1)]
    df = spark.createDataFrame(rows, "arm string, seg string, y int")
    out = {r["segment"]: r for r in
           uplift_by_segment(df, "arm", "T", "y", "seg").collect()}
    assert out["a"]["rate_treat"] == 1.0
    assert out["a"]["rate_ctrl"] == 0.5
    assert out["a"]["uplift"] == 0.5
    assert out["b"]["uplift"] == -1.0


def test_interval_allocate_conserves_mass(spark):
    import pyspark.sql.functions as F
    from niamoto_spark.operators.timeseries import interval_allocate
    # [0, 150) value 300 over granule 100: bucket 0 gets 200, bucket 1 gets 100
    df = spark.createDataFrame([(0, 150, 300.0), (250, 260, 50.0)],
                               "s long, e long, v double")
    out = interval_allocate(df, "s", "e", "v", granule_s=100).collect()
    by = {(r["s"], r["bucket"]): r for r in out}
    assert by[(0, 0)]["allocated"] == 200.0
    assert by[(0, 1)]["allocated"] == 100.0
    assert by[(250, 2)]["allocated"] == 50.0          # fully inside
    total = sum(r["allocated"] for r in out)
    assert total == 350.0                              # mass conserved


def test_golden_record_null_never_erases(spark):
    from niamoto_spark.operators.cleaning import golden_record
    rows = [
        (1, 1, 10, "a@x", "NY"),
        (1, 2, 11, None, "SF"),     # later null email keeps a@x
        (1, 3, 12, "b@x", None),    # later null city keeps SF
        (2, 1, 20, None, None),     # all-null attrs stay null
    ]
    df = spark.createDataFrame(
        rows, "k long, ord long, tb long, email string, city string")
    out = {r["k"]: r for r in
           golden_record(df, "k", "ord", "tb",
                         ["email", "city"]).collect()}
    assert out[1]["email"] == "b@x"
    assert out[1]["city"] == "SF"
    assert out[1]["n_records"] == 3
    assert out[2]["email"] is None


def test_cumulative_unique_densifies_and_counts_once(spark):
    from niamoto_spark.operators.timeseries import cumulative_unique
    rows = [(1, 0), (1, 250), (2, 30), (3, 250)]  # granule 100
    df = spark.createDataFrame(rows, "u long, t long")
    out = {r["bucket"]: r for r in
           cumulative_unique(df, "u", "t", granule_s=100).collect()}
    assert out[0]["new_entities"] == 2     # users 1, 2
    assert out[1]["new_entities"] == 0     # densified gap
    assert out[2]["new_entities"] == 1     # user 3 (1 is a repeat)
    assert out[2]["cum_entities"] == 3


def test_poisson_bootstrap_ci_brackets_mean(spark):
    from niamoto_spark.operators.experiments import poisson_bootstrap
    df = (spark.range(0, 3000)
          .withColumn("v", (F.col("id") % 100).cast("double")))
    r = poisson_bootstrap(df, "v", "id", n_boot=40).collect()[0]
    assert r["n_rows"] == 3000 and r["n_boot"] == 40
    assert r["ci_lo"] < r["mean"] < r["ci_hi"]
    # CI width for mean of uniform(0..99) at n=3000 ~ ±1; sanity bound
    assert r["ci_hi"] - r["ci_lo"] < 5.0


def test_autocorrelation_perfect_period2(spark):
    from niamoto_spark.operators.timeseries import autocorrelation
    # alternating series: ACF(1) = -1, ACF(2) = +1
    rows = [("s", i, float(10 if i % 2 == 0 else 0)) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {r["lag"]: r for r in
           autocorrelation(df, "k", "t", "v", max_lag=2).collect()}
    assert out[1]["acf"] == pytest.approx(-1.0, abs=1e-6)
    assert out[2]["acf"] == pytest.approx(1.0, abs=1e-6)
    assert out[1]["n_pairs"] == 19


def test_growth_accounting_identity(spark):
    from niamoto_spark.operators.timeseries import growth_accounting
    # u1 active day0,1,3 (retained d1, resurrected d3)
    # u2 active day0 only (churned at d1); u3 first seen day1
    rows = [(1, 0), (1, 100), (1, 300), (2, 0), (3, 100)]
    df = spark.createDataFrame(rows, "u long, t long")
    out = {r["period"]: r for r in
           growth_accounting(df, "u", "t", granule_s=100).collect()}
    d0, d1, d3 = out[0], out[1], out[3]
    assert (d0["active"], d0["new_users"]) == (2, 2)
    assert (d1["active"], d1["new_users"], d1["retained"],
            d1["resurrected"], d1["churned"]) == (2, 1, 1, 0, 1)
    assert (d3["resurrected"], d3["retained"]) == (1, 0)
    for r in out.values():
        assert r["active"] == r["new_users"] + r["retained"] \
            + r["resurrected"]
