"""Exact evaluation metrics (operators/mleval.py): AUC with midrank
ties, calibration bins, ranking metrics."""

import math

import pytest


class TestBinaryAuc:
    def _auc(self, spark, rows):
        from niamoto_spark.operators.mleval import binary_auc

        df = spark.createDataFrame(rows, "s double, y int")
        return binary_auc(df, "s", "y").first()

    def test_perfect_separation(self, spark):
        r = self._auc(spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])
        assert r["auc"] == 1.0 and r["n_pos"] == 2 and r["n_neg"] == 2

    def test_perfectly_wrong(self, spark):
        r = self._auc(spark, [(0.1, 1), (0.9, 0)])
        assert r["auc"] == 0.0

    def test_all_tied_is_half(self, spark):
        r = self._auc(spark, [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)])
        assert r["auc"] == pytest.approx(0.5)

    def test_matches_pairwise_definition(self, spark):
        import random

        rng = random.Random(11)
        rows = [(round(rng.uniform(0, 1), 2), rng.randint(0, 1))
                for _ in range(200)]
        pos = [s for s, y in rows if y == 1]
        neg = [s for s, y in rows if y == 0]
        wins = sum(1.0 if p > n else (0.5 if p == n else 0.0)
                   for p in pos for n in neg)
        expect = wins / (len(pos) * len(neg))
        r = self._auc(spark, rows)
        assert r["auc"] == pytest.approx(expect, abs=1e-12)

    def test_degenerate_single_class_null(self, spark):
        r = self._auc(spark, [(0.5, 1), (0.9, 1)])
        assert r["auc"] is None


class TestCalibration:
    def test_bins_and_brier(self, spark):
        from niamoto_spark.operators.mleval import calibration_bins

        rows = [(0.05, 0), (0.05, 0), (0.95, 1), (0.95, 0)]
        df = spark.createDataFrame(rows, "p double, y int")
        got = {r["bin"]: r for r in
               calibration_bins(df, "p", "y", n_bins=10).collect()}
        assert got[0]["n"] == 2 and got[0]["frac_pos"] == 0.0
        assert got[9]["frac_pos"] == pytest.approx(0.5)
        assert got[9]["brier_sum"] == pytest.approx(
            (0.95 - 1) ** 2 + 0.95 ** 2)

    def test_prob_one_lands_in_last_bin(self, spark):
        from niamoto_spark.operators.mleval import calibration_bins

        df = spark.createDataFrame([(1.0, 1)], "p double, y int")
        assert calibration_bins(df, "p", "y").first()["bin"] == 9


class TestRankMetrics:
    def _frames(self, spark, ranking, rel):
        r = spark.createDataFrame(ranking,
                                  "query_id string, doc_id long, "
                                  "rank int")
        v = spark.createDataFrame(rel,
                                  "query_id string, doc_id long, "
                                  "rel int")
        return r, v

    def test_perfect_ranking(self, spark):
        from niamoto_spark.operators.mleval import rank_metrics

        r, v = self._frames(spark,
                            [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
                            [("q", 1, 1), ("q", 2, 1)])
        m = rank_metrics(r, v, k=3).first()
        assert m["ndcg"] == pytest.approx(1.0)
        assert m["mrr"] == 1.0
        assert m["p_at_k"] == pytest.approx(2 / 3)

    def test_relevant_at_rank2(self, spark):
        from niamoto_spark.operators.mleval import rank_metrics

        r, v = self._frames(spark, [("q", 1, 1), ("q", 2, 2)],
                            [("q", 2, 1)])
        m = rank_metrics(r, v, k=2).first()
        assert m["mrr"] == 0.5
        assert m["ndcg"] == pytest.approx(
            (1 / math.log2(3)) / (1 / math.log2(2)))

    def test_no_relevant_zero_metrics(self, spark):
        from niamoto_spark.operators.mleval import rank_metrics

        r, v = self._frames(spark, [("q", 1, 1)], [("x", 9, 1)])
        m = rank_metrics(r, v, k=1).where("query_id = 'q'").first()
        assert m["ndcg"] == 0.0 and m["mrr"] == 0.0

    def test_idcg_counts_unretrieved_relevant(self, spark):
        """3 relevant docs total, only 1 retrieved at rank 1:
        NDCG = (1/log2 2) / (1/log2 2 + 1/log2 3 + 1/log2 4)."""
        from niamoto_spark.operators.mleval import rank_metrics

        r, v = self._frames(spark, [("q", 1, 1)],
                            [("q", 1, 1), ("q", 2, 1), ("q", 3, 1)])
        m = rank_metrics(r, v, k=10).first()
        ideal = 1 + 1 / math.log2(3) + 0.5
        assert m["ndcg"] == pytest.approx(1.0 / ideal)
