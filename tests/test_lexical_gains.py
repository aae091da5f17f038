"""lexical_stats (text.py), keywords_per_doc (tfidf.py), gains_table
and sliced binary_auc (mleval.py)."""

import math

import pytest
from pyspark.sql import functions as F


class TestLexicalStats:
    def test_hand_computed(self, spark):
        from niamoto_spark.operators.text import lexical_stats

        df = spark.createDataFrame(
            [("s1", "a a b"), ("s1", "c"), ("s2", "x y")],
            "src string, text string")
        got = {r["src"]: r for r in
               lexical_stats(df, "text", "src").collect()}
        s1 = got["s1"]
        assert s1["n_tokens"] == 4 and s1["n_types"] == 3
        assert s1["ttr"] == pytest.approx(0.75)
        assert s1["hapax_frac"] == pytest.approx(2 / 3)  # b, c once
        assert got["s2"]["hapax_frac"] == 1.0


class TestKeywords:
    def test_rare_term_wins(self, spark):
        from niamoto_spark.operators.tfidf import keywords_per_doc

        df = spark.createDataFrame(
            [(1, "common rare common"), (2, "common other"),
             (3, "common thing")],
            "doc_id long, text string")
        kw = keywords_per_doc(df, "doc_id", "text", top_k=1)
        got = {r["doc_id"]: r["keyword"] for r in kw.collect()}
        # 'common' has df=3 -> idf 0; rare terms win everywhere
        assert got[1] == "rare"
        assert got[2] == "other"

    def test_score_algebra(self, spark):
        from niamoto_spark.operators.tfidf import keywords_per_doc

        df = spark.createDataFrame(
            [(1, "x x y"), (2, "y")], "doc_id long, text string")
        rows = {(r["doc_id"], r["keyword"]): r["score"] for r in
                keywords_per_doc(df, "doc_id", "text",
                                 top_k=5, round_dp=8).collect()}
        assert rows[(1, "x")] == pytest.approx(
            round(2 * math.log(2 / 1), 8))
        assert rows[(1, "y")] == pytest.approx(0.0)

    def test_topk_and_tiebreak(self, spark):
        from niamoto_spark.operators.tfidf import keywords_per_doc

        df = spark.createDataFrame([(1, "b a"), (2, "z")],
                                   "doc_id long, text string")
        rows = keywords_per_doc(df, "doc_id", "text",
                                top_k=2).where("doc_id = 1").collect()
        ranks = {r["rank"]: r["keyword"] for r in rows}
        assert ranks == {1: "a", 2: "b"}  # equal scores, lexical tie


class TestGainsTable:
    def test_perfect_model_gains(self, spark):
        from niamoto_spark.operators.mleval import gains_table

        rows = ([(0.95, 1)] * 10) + ([(0.05, 0)] * 90)
        df = spark.createDataFrame(rows, "p double, y int")
        got = {r["bin"]: r for r in
               gains_table(df, "p", "y", n_bins=10).collect()}
        top = got[1]
        assert top["capture_rate"] == pytest.approx(1.0)
        assert top["cum_capture"] == pytest.approx(1.0)
        assert top["cum_lift"] == pytest.approx(10.0)  # 100% vs 10% base

    def test_random_model_lift_one(self, spark):
        from niamoto_spark.operators.mleval import gains_table

        rows = [((i % 10) / 10 + 0.05, i % 2) for i in range(200)]
        df = spark.createDataFrame(rows, "p double, y int")
        out = gains_table(df, "p", "y", n_bins=10).collect()
        last = max(out, key=lambda r: r["bin"])
        assert last["cum_capture"] == pytest.approx(1.0)
        assert last["cum_lift"] == pytest.approx(1.0)


class TestSlicedAuc:
    def test_slices_independent(self, spark):
        from niamoto_spark.operators.mleval import binary_auc

        rows = ([("good", 0.9, 1), ("good", 0.1, 0)]
                + [("bad", 0.1, 1), ("bad", 0.9, 0)])
        df = spark.createDataFrame(rows, "g string, s double, y int")
        got = {r["g"]: r["auc"] for r in
               binary_auc(df, "s", "y", group_col="g").collect()}
        assert got["good"] == 1.0 and got["bad"] == 0.0

    def test_ungrouped_matches_single_group(self, spark):
        from niamoto_spark.operators.mleval import binary_auc

        rows = [(0.1 * i, i % 2) for i in range(20)]
        df = spark.createDataFrame(rows, "s double, y int")
        plain = binary_auc(df, "s", "y").first()["auc"]
        grouped = binary_auc(df.withColumn("g", F.lit("x")),
                             "s", "y", group_col="g").first()["auc"]
        assert plain == pytest.approx(grouped)
