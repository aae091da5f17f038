"""zipf_fit, burstiness, vocabulary_overlap (operators/text.py)."""

import math

import pytest


class TestZipfFit:
    def test_exact_power_law_slope(self, spark):
        """Geometric frequency spectrum: slope negative, type count
        exact."""
        from niamoto_spark.operators.text import zipf_fit

        text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
        df = spark.createDataFrame([(1, text)],
                                   "doc_id long, text string")
        r = zipf_fit(df, "text").first()
        # ln c = ln 8 - k ln r fits ranks (1,2,3,4) counts (8,4,2,1):
        # not a perfect line; just pin monotone-negative slope + n
        assert r["zipf_slope"] < 0
        assert r["n_types"] == 4

    def test_perfect_line_r2_one(self, spark):
        from niamoto_spark.operators.text import zipf_fit

        # two points always fit a line exactly: r2 = 1, slope = -1
        text = " ".join(["x"] * 6 + ["y"] * 3)
        df = spark.createDataFrame([(1, text)],
                                   "doc_id long, text string")
        r = zipf_fit(df, "text").first()
        assert r["r2"] == pytest.approx(1.0)
        assert r["zipf_slope"] == pytest.approx(
            math.log(3 / 6) / math.log(2), abs=1e-9)


class TestBurstiness:
    def test_constant_rate_fano_zero(self, spark):
        from niamoto_spark.operators.text import burstiness

        rows = [(1, b) for b in range(10)]  # 1 event per bucket
        df = spark.createDataFrame(rows, "u long, b long")
        r = burstiness(df, "u", "b").first()
        assert r["fano"] == 0.0 and r["mean_rate"] == 1.0

    def test_bursty_user_fano_above_one(self, spark):
        from niamoto_spark.operators.text import burstiness

        rows = [(1, 0)] * 99 + [(1, 1)]  # 99 in one bucket, 1 in other
        df = spark.createDataFrame(rows, "u long, b long")
        r = burstiness(df, "u", "b").first()
        # counts {99, 1}: mean 50, var_pop 2401 -> fano 48.02
        assert r["fano"] == pytest.approx(2401 / 50)

    def test_users_independent(self, spark):
        from niamoto_spark.operators.text import burstiness

        rows = [(1, 0), (1, 1), (2, 0), (2, 0)]
        df = spark.createDataFrame(rows, "u long, b long")
        got = {r["u"]: r["n_buckets"] for r in
               burstiness(df, "u", "b").collect()}
        assert got == {1: 2, 2: 1}


class TestVocabularyOverlap:
    def test_jaccard_hand_computed(self, spark):
        from niamoto_spark.operators.text import vocabulary_overlap

        df = spark.createDataFrame(
            [("s1", "a b c"), ("s2", "b c d"), ("s3", "x y")],
            "src string, text string")
        got = {(r["group_a"], r["group_b"]): r for r in
               vocabulary_overlap(df, "text", "src").collect()}
        r = got[("s1", "s2")]
        assert r["n_shared"] == 2
        assert r["jaccard"] == pytest.approx(0.5)  # |{b,c}| / |{a,b,c,d}|
        assert ("s1", "s3") not in got  # zero overlap emits no row

    def test_duplicate_tokens_count_once(self, spark):
        from niamoto_spark.operators.text import vocabulary_overlap

        df = spark.createDataFrame(
            [("s1", "a a a b"), ("s2", "a")],
            "src string, text string")
        r = vocabulary_overlap(df, "text", "src").first()
        assert r["n_shared"] == 1
        assert r["jaccard"] == pytest.approx(0.5)

    def test_identical_vocab_jaccard_one(self, spark):
        from niamoto_spark.operators.text import vocabulary_overlap

        df = spark.createDataFrame(
            [("s1", "p q"), ("s2", "q p p")],
            "src string, text string")
        assert vocabulary_overlap(df, "text", "src") \
            .first()["jaccard"] == 1.0
