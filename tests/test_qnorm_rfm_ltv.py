"""quantile_normalize (cleaning.py), rfm_segment (features.py),
cohort_ltv (timeseries.py), global_rank (ranks.py)."""

import pytest
from pyspark.sql import functions as F


class TestGlobalRank:
    def test_rank_is_exact_and_partition_invariant(self, spark):
        from niamoto_spark.operators.ranks import global_rank

        df = spark.createDataFrame([(i, float((i * 7) % 50))
                                    for i in range(200)],
                                   "id long, v double")
        a = {(r["id"], r["rank"]) for r in
             global_rank(df, ["v", "id"], num_partitions=3).collect()}
        b = {(r["id"], r["rank"]) for r in
             global_rank(df, ["v", "id"], num_partitions=11).collect()}
        assert a == b
        ranks = sorted(r for _, r in a)
        assert ranks == list(range(1, 201))


class TestQuantileNormalize:
    def test_maps_onto_reference_distribution(self, spark):
        from niamoto_spark.operators.cleaning import quantile_normalize

        src = spark.createDataFrame([(float(i),) for i in range(100)],
                                    "v double")
        ref = spark.createDataFrame(
            [(float(1000 + i * 10),) for i in range(100)],
            "r double")
        out = quantile_normalize(src, "v", ref, "r")
        vals = sorted(r["qnorm"] for r in out.collect())
        # mapped values are exactly the reference order statistics
        assert vals == sorted(float(1000 + i * 10) for i in range(100))

    def test_monotone_mapping(self, spark):
        from niamoto_spark.operators.cleaning import quantile_normalize

        src = spark.createDataFrame(
            [(float(v),) for v in (5, 1, 9, 3)], "v double")
        ref = spark.createDataFrame(
            [(float(v),) for v in (100, 200, 300, 400)], "r double")
        rows = sorted(quantile_normalize(src, "v", ref, "r").collect(),
                      key=lambda r: r["v"])
        mapped = [r["qnorm"] for r in rows]
        assert mapped == sorted(mapped)
        assert mapped == [100.0, 200.0, 300.0, 400.0]

    def test_different_sizes(self, spark):
        from niamoto_spark.operators.cleaning import quantile_normalize

        src = spark.createDataFrame([(float(i),) for i in range(10)],
                                    "v double")
        ref = spark.createDataFrame([(0.0,), (100.0,)], "r double")
        out = quantile_normalize(src, "v", ref, "r").collect()
        # bottom half maps to 0, top half to 100
        lo = [r for r in out if r["v"] < 5]
        hi = [r for r in out if r["v"] >= 5]
        assert all(r["qnorm"] == 0.0 for r in lo)
        assert all(r["qnorm"] == 100.0 for r in hi)


class TestRfm:
    def test_tiles_and_code(self, spark):
        from niamoto_spark.operators.features import rfm_segment

        rows = []
        for c in range(10):
            for o in range(c + 1):  # customer c has c+1 orders
                rows.append((c, c * 10 + o, float(100 * (c + 1))))
        df = spark.createDataFrame(rows,
                                   "cust long, d long, amt double")
        rfm = {r["cust"]: r for r in
               rfm_segment(df, "cust", F.col("d"), "amt",
                           n_tiles=2).collect()}
        # customer 9: most recent, most frequent, most monetary
        assert rfm[9]["rfm_code"] == "222"
        assert rfm[0]["rfm_code"] == "111"
        assert rfm[9]["frequency"] == 10

    def test_tile_populations_balanced(self, spark):
        from niamoto_spark.operators.features import rfm_segment

        rows = [(c, c, float(c)) for c in range(100)]
        df = spark.createDataFrame(rows,
                                   "cust long, d long, amt double")
        out = rfm_segment(df, "cust", F.col("d"), "amt", n_tiles=5)
        sizes = {r["m_tile"]: r["n"] for r in
                 out.groupBy("m_tile").agg(F.count("*").alias("n"))
                 .collect()}
        assert sizes == {t: 20 for t in range(1, 6)}


class TestCohortLtv:
    def test_accumulation(self, spark):
        from niamoto_spark.operators.timeseries import cohort_ltv

        rows = [(1, 10, 100.0), (1, 11, 50.0),  # cohort 10
                (2, 10, 200.0),                  # cohort 10
                (3, 11, 70.0)]                   # cohort 11
        df = spark.createDataFrame(rows,
                                   "cust long, m long, amt double")
        out = {(r["cohort_month"], r["age_months"]): r for r in
               cohort_ltv(df, "cust", F.col("m"), "amt").collect()}
        c10_age0 = out[(10, 0)]
        assert c10_age0["cohort_size"] == 2
        assert c10_age0["revenue"] == 300.0
        assert c10_age0["cum_revenue_per_customer"] == 150.0
        c10_age1 = out[(10, 1)]
        assert c10_age1["cum_revenue_per_customer"] == 175.0
        assert out[(11, 0)]["cohort_size"] == 1

    def test_max_age_cutoff(self, spark):
        from niamoto_spark.operators.timeseries import cohort_ltv

        rows = [(1, 0, 1.0), (1, 100, 1.0)]
        df = spark.createDataFrame(rows,
                                   "cust long, m long, amt double")
        ages = {r["age_months"] for r in
                cohort_ltv(df, "cust", F.col("m"), "amt",
                           max_age=12).collect()}
        assert ages == {0}


def test_qnorm_null_sources_stay_null(spark):
    """NULL source values must not be ranked (they would all map onto
    the reference minimum); NULL reference values are ignored."""
    from niamoto_spark.operators.cleaning import quantile_normalize

    src = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, None)], "id int, v double")
    ref = spark.createDataFrame(
        [(100.0,), (None,), (300.0,)], "r double")
    out = {r["id"]: r["qnorm"]
           for r in quantile_normalize(src, "v", ref, "r",
                                       id_cols=["id"]).collect()}
    assert out[2] is None and out[4] is None
    assert out[1] == 100.0 and out[3] == 300.0
