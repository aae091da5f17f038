"""quantile_bucket + mutual_information (operators/features.py),
nucleus_vocab (operators/text.py), locf_fill (operators/timeseries.py)."""

import math

import pytest
from pyspark.sql import functions as F


class TestQuantileBucket:
    def test_balanced_buckets(self, spark):
        from niamoto_spark.operators.features import quantile_bucket

        df = spark.createDataFrame([(i, float(i % 97)) for i in range(100)],
                                   "id long, v double")
        out = quantile_bucket(df, "v", 4, ["id"])
        sizes = {r["bucket"]: r["n"] for r in
                 out.groupBy("bucket").agg(F.count("*").alias("n"))
                 .collect()}
        assert sizes == {1: 25, 2: 25, 3: 25, 4: 25}

    def test_bucket_order_respects_values(self, spark):
        from niamoto_spark.operators.features import quantile_bucket

        df = spark.createDataFrame([(i, float(i)) for i in range(20)],
                                   "id long, v double")
        out = quantile_bucket(df, "v", 2, ["id"]).collect()
        for r in out:
            assert r["bucket"] == (1 if r["v"] < 10 else 2)

    def test_remainder_distributed_by_floor_rule(self, spark):
        from niamoto_spark.operators.features import quantile_bucket

        df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                                   "id long, v double")
        sizes = (quantile_bucket(df, "v", 3, ["id"])
                 .groupBy("bucket").count().collect())
        got = {r["bucket"]: r["count"] for r in sizes}
        # floor(rank*3/10): ranks 0-3 -> 1, 4-6 -> 2, 7-9 -> 3
        assert got == {1: 4, 2: 3, 3: 3}

    def test_partition_invariance(self, spark):
        from niamoto_spark.operators.features import quantile_bucket

        df = spark.createDataFrame([(i, float(i * 7 % 50))
                                    for i in range(200)],
                                   "id long, v double")
        a = {(r["id"], r["bucket"]) for r in
             quantile_bucket(df, "v", 5, ["id"],
                             num_partitions=2).collect()}
        b = {(r["id"], r["bucket"]) for r in
             quantile_bucket(df, "v", 5, ["id"],
                             num_partitions=13).collect()}
        assert a == b


class TestNucleusVocab:
    def test_minimal_prefix_covering_p(self, spark):
        from niamoto_spark.operators.text import nucleus_vocab

        # 'a' x6, 'b' x3, 'c' x1 -> total 10.  p=0.6: 'a' (before 0.0)
        # kept, 'b' (before 0.6) dropped.
        df = spark.createDataFrame([(1, "a a a a a a b b b c")],
                                   "id long, text string")
        kept = {r["t"] for r in nucleus_vocab(df, "text", p=0.6).collect()}
        assert kept == {"a"}
        # p just above 0.6 admits 'b'
        kept2 = {r["t"] for r in
                 nucleus_vocab(df, "text", p=0.61).collect()}
        assert kept2 == {"a", "b"}

    def test_shares_sum_and_order(self, spark):
        from niamoto_spark.operators.text import nucleus_vocab

        df = spark.createDataFrame([(1, "x x y z")],
                                   "id long, text string")
        rows = {r["t"]: r for r in
                nucleus_vocab(df, "text", p=1.0).collect()}
        assert rows["x"]["share"] == pytest.approx(0.5)
        assert rows["x"]["cum_before"] == 0.0
        # tie y/z broken alphabetically: y before z
        assert rows["y"]["cum_before"] == pytest.approx(0.5)
        assert rows["z"]["cum_before"] == pytest.approx(0.75)

    def test_partition_invariance(self, spark):
        from niamoto_spark.operators.text import nucleus_vocab

        df = spark.createDataFrame(
            [(i, f"tok{i % 17} tok{i % 5} common") for i in range(300)],
            "id long, text string")
        a = {(r["t"], r["cnt"]) for r in
             nucleus_vocab(df, "text", p=0.8,
                           num_partitions=3).collect()}
        b = {(r["t"], r["cnt"]) for r in
             nucleus_vocab(df, "text", p=0.8,
                           num_partitions=11).collect()}
        assert a == b


class TestLocf:
    def test_carry_forward(self, spark):
        from niamoto_spark.operators.timeseries import locf_fill

        df = spark.createDataFrame(
            [(1, 1, 10.0), (1, 2, None), (1, 3, None), (1, 4, 7.0),
             (1, 5, None), (2, 1, None), (2, 2, 3.0)],
            "k long, o long, v double")
        got = {(r["k"], r["o"]): r["v"] for r in
               locf_fill(df, "k", "o", ["v"]).collect()}
        assert got[(1, 2)] == 10.0 and got[(1, 3)] == 10.0
        assert got[(1, 5)] == 7.0
        assert got[(2, 1)] is None  # leading null stays without NOCB

    def test_backward_fills_leading_nulls(self, spark):
        from niamoto_spark.operators.timeseries import locf_fill

        df = spark.createDataFrame(
            [(1, 1, None), (1, 2, 5.0)], "k long, o long, v double")
        got = {r["o"]: r["v"] for r in
               locf_fill(df, "k", "o", ["v"], backward=True).collect()}
        assert got[1] == 5.0

    def test_multiple_columns_one_call(self, spark):
        from niamoto_spark.operators.timeseries import locf_fill

        df = spark.createDataFrame(
            [(1, 1, 1.0, None), (1, 2, None, 2.0), (1, 3, None, None)],
            "k long, o long, a double, b double")
        r3 = {r["o"]: (r["a"], r["b"]) for r in
              locf_fill(df, "k", "o", ["a", "b"]).collect()}[3]
        assert r3 == (1.0, 2.0)


class TestMutualInformation:
    def test_independent_columns_zero_mi(self, spark):
        from niamoto_spark.operators.features import mutual_information

        rows = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
        df = spark.createDataFrame(rows, "a string, b string")
        r = mutual_information(df, "a", "b").first()
        assert r["mi_nats"] == pytest.approx(0.0, abs=1e-12)
        assert r["n"] == 100

    def test_perfect_dependence_equals_entropy(self, spark):
        from niamoto_spark.operators.features import mutual_information

        rows = ([("x", "p")] * 30) + ([("y", "q")] * 70)
        df = spark.createDataFrame(rows, "a string, b string")
        r = mutual_information(df, "a", "b").first()
        h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
        assert r["mi_nats"] == pytest.approx(h, abs=1e-12)

    def test_nulls_excluded(self, spark):
        from niamoto_spark.operators.features import mutual_information

        df = spark.createDataFrame(
            [("x", "p"), ("x", None), (None, "p")],
            "a string, b string")
        assert mutual_information(df, "a", "b").first()["n"] == 1
