"""Naive Bayes (operators/classifier.py) and Kaplan-Meier
(operators/timeseries.py) unit tests — hand-computed goldens."""

import math

import pytest


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestNaiveBayes:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (1, "cat cat dog", "pet"),
            (2, "dog cat fish", "pet"),
            (3, "stock bond market", "fin"),
            (4, "bond market market", "fin"),
            (5, "cat market", "pet"),
        ]
        return _df(spark, rows, "doc_id long, text string, lang string")

    def test_separable_corpus_predicted_correctly(self, spark, corpus):
        from niamoto_spark.operators.classifier import (naive_bayes_fit,
                                                        naive_bayes_predict)

        model = naive_bayes_fit(corpus, "doc_id", "text", "lang")
        pred = {r["doc_id"]: r["label"]
                for r in naive_bayes_predict(
                    corpus, "doc_id", "text", model).collect()}
        assert pred[1] == "pet" and pred[2] == "pet"
        assert pred[3] == "fin" and pred[4] == "fin"

    def test_score_matches_hand_computation(self, spark, corpus):
        """Doc 'cat' under class pet: logprior ln(3/5) + ln((cnt+1)/
        (tot + V)) with V=6 distinct tokens, pet tot=8, cnt(cat,pet)=4."""
        from niamoto_spark.operators.classifier import (naive_bayes_fit,
                                                        naive_bayes_score)

        probe = _df(spark, [(99, "cat")], "doc_id long, text string")
        model = naive_bayes_fit(corpus, "doc_id", "text", "lang")
        assert model["vocab_size"] == 6
        rows = {r["label"]: r["score"]
                for r in naive_bayes_score(
                    probe, "doc_id", "text", model).collect()}
        expect_pet = math.log(3 / 5) + math.log((4 + 1) / (8 + 6))
        expect_fin = math.log(2 / 5) + math.log((0 + 1) / (6 + 6))
        assert rows["pet"] == pytest.approx(expect_pet, abs=1e-12)
        assert rows["fin"] == pytest.approx(expect_fin, abs=1e-12)

    def test_unseen_token_hits_smoothing_floor(self, spark, corpus):
        from niamoto_spark.operators.classifier import (naive_bayes_fit,
                                                        naive_bayes_score)

        probe = _df(spark, [(1, "zebra")], "doc_id long, text string")
        model = naive_bayes_fit(corpus, "doc_id", "text", "lang")
        rows = {r["label"]: r["score"]
                for r in naive_bayes_score(
                    probe, "doc_id", "text", model).collect()}
        assert rows["pet"] == pytest.approx(
            math.log(3 / 5) + math.log(1 / (8 + 6)), abs=1e-12)

    def test_alpha_scales_smoothing(self, spark, corpus):
        from niamoto_spark.operators.classifier import (naive_bayes_fit,
                                                        naive_bayes_score)

        probe = _df(spark, [(1, "zebra")], "doc_id long, text string")
        model = naive_bayes_fit(corpus, "doc_id", "text", "lang",
                                alpha=2.0)
        rows = {r["label"]: r["score"]
                for r in naive_bayes_score(
                    probe, "doc_id", "text", model).collect()}
        assert rows["pet"] == pytest.approx(
            math.log(3 / 5) + math.log(2 / (8 + 2 * 6)), abs=1e-12)


class TestKaplanMeier:
    def test_textbook_curve(self, spark):
        """Durations 6,6,6,7,10 with one censor at 7: classic KM.
        t=6: n=5, d=2 -> S=0.6; t=10: n=1, d=1 -> S=0."""
        from niamoto_spark.operators.timeseries import kaplan_meier

        df = _df(spark, [(6, 1), (6, 1), (6, 0), (7, 1), (10, 1)],
                 "dur long, ev int")
        rows = {r["t"]: r for r in
                kaplan_meier(df, "dur", "ev").collect()}
        assert rows[6]["n_at_risk"] == 5 and rows[6]["d"] == 2
        assert rows[6]["survival"] == pytest.approx(3 / 5)
        # t=7: at risk 2 (the censored 6 dropped out), d=1 -> 0.6*0.5
        assert rows[7]["survival"] == pytest.approx(0.6 * 0.5)
        # final event wipes out the risk set -> exactly 0, no ln(0)
        assert rows[10]["survival"] == 0.0

    def test_censored_only_times_emit_no_row(self, spark):
        from niamoto_spark.operators.timeseries import kaplan_meier

        df = _df(spark, [(1, 0), (2, 1), (3, 0)], "dur long, ev int")
        ts = sorted(r["t"] for r in
                    kaplan_meier(df, "dur", "ev").collect())
        assert ts == [2]

    def test_groups_are_independent(self, spark):
        from niamoto_spark.operators.timeseries import kaplan_meier

        df = _df(spark, [("a", 1, 1), ("a", 2, 1),
                         ("b", 1, 1), ("b", 9, 0)],
                 "g string, dur long, ev int")
        rows = {(r["g"], r["t"]): r["survival"] for r in
                kaplan_meier(df, "dur", "ev", group_col="g").collect()}
        assert rows[("a", 1)] == pytest.approx(0.5)
        assert rows[("a", 2)] == 0.0
        assert rows[("b", 1)] == pytest.approx(0.5)

    def test_survival_monotone_nonincreasing(self, spark):
        import random

        from niamoto_spark.operators.timeseries import kaplan_meier

        rng = random.Random(7)
        rows = [(rng.randint(1, 20), rng.randint(0, 1))
                for _ in range(200)]
        df = _df(spark, rows, "dur long, ev int")
        curve = (kaplan_meier(df, "dur", "ev")
                 .orderBy("t").collect())
        s = [r["survival"] for r in curve]
        assert all(a >= b - 1e-12 for a, b in zip(s, s[1:]))
        assert all(0.0 <= x <= 1.0 for x in s)
