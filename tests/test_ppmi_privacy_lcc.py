"""ppmi_vectors / ppmi_token_similarity (lm.py), dp_counts
(privacy.py), clustering_coefficient (graph.py)."""

import math

import pytest
from pyspark.sql import functions as F


class TestPpmi:
    def test_pair_counts_window2(self, spark):
        from niamoto_spark.operators.lm import ppmi_vectors

        # 'a b c': pairs (a,b) (a,c) (b,a) (b,c) (c,a) (c,b)
        df = spark.createDataFrame([(1, "a b c")],
                                   "doc_id long, text string")
        vec = ppmi_vectors(df, "doc_id", "text", window=2, min_count=1)
        got = {(r["w"], r["c"]): r["n_wc"] for r in vec.collect()}
        # every ordered pair occurs once -> S=6, marginals 2 each:
        # ppmi = ln(1*6/(2*2)) = ln(1.5) > 0, all 6 pairs survive
        assert len(got) == 6
        assert all(v == 1 for v in got.values())

    def test_ppmi_value(self, spark):
        from niamoto_spark.operators.lm import ppmi_vectors

        df = spark.createDataFrame([(1, "a b c")],
                                   "doc_id long, text string")
        r = ppmi_vectors(df, "doc_id", "text", window=2,
                         min_count=1).first()
        assert r["ppmi"] == pytest.approx(math.log(1.5), abs=1e-12)

    def test_window1_excludes_distance2(self, spark):
        from niamoto_spark.operators.lm import ppmi_vectors

        df = spark.createDataFrame([(1, "a b c")],
                                   "doc_id long, text string")
        vec = ppmi_vectors(df, "doc_id", "text", window=1, min_count=1)
        pairs = {(r["w"], r["c"]) for r in vec.collect()}
        assert ("a", "c") not in pairs and ("c", "a") not in pairs

    def test_identical_contexts_cosine_one(self, spark):
        from niamoto_spark.operators.lm import (ppmi_token_similarity,
                                                ppmi_vectors)

        # x and y always appear in identical contexts
        rows = [(i, f"left{i % 2} x right{i % 2}") for i in range(10)]
        rows += [(100 + i, f"left{i % 2} y right{i % 2}")
                 for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        vec = ppmi_vectors(df, "doc_id", "text", window=1, min_count=1)
        sim = {(r["w_a"], r["w_b"]): r["cosine"] for r in
               ppmi_token_similarity(vec, topk=50).collect()}
        assert sim[("x", "y")] == pytest.approx(1.0, abs=1e-6)


class TestDpCounts:
    def test_deterministic_and_noise_shaped(self, spark):
        from niamoto_spark.operators.privacy import dp_counts

        rows = [(f"g{i % 20}",) for i in range(400)]
        df = spark.createDataFrame(rows, "g string")
        a = {r["g"]: r["noisy_count"] for r in
             dp_counts(df, ["g"], epsilon=1.0, seed="s").collect()}
        b = {r["g"]: r["noisy_count"] for r in
             dp_counts(df, ["g"], epsilon=1.0, seed="s").collect()}
        assert a == b  # same seed -> identical release
        # noise actually perturbs: not every group exactly 20
        assert any(abs(v - 20.0) > 1e-6 for v in a.values())
        # Laplace(1) noise: |noise| > 15 has probability ~3e-7 per
        # group — treat as a shape bound
        assert all(abs(v - 20.0) < 15 for v in a.values())

    def test_seed_changes_release(self, spark):
        from niamoto_spark.operators.privacy import dp_counts

        df = spark.createDataFrame([("g",)] * 10, "g string")
        a = dp_counts(df, ["g"], seed="s1").first()["noisy_count"]
        b = dp_counts(df, ["g"], seed="s2").first()["noisy_count"]
        assert a != b

    def test_epsilon_scales_noise(self, spark):
        from niamoto_spark.operators.privacy import dp_counts

        df = spark.createDataFrame([(f"g{i % 50}",) for i in range(50)],
                                   "g string")
        tight = dp_counts(df, ["g"], epsilon=10.0, seed="s").collect()
        loose = dp_counts(df, ["g"], epsilon=0.1, seed="s").collect()
        dev_t = sum(abs(r["noisy_count"] - 1) for r in tight)
        dev_l = sum(abs(r["noisy_count"] - 1) for r in loose)
        # noisy_count is rounded to 4dp, so the 100x relation holds
        # only to rounding precision
        assert dev_l == pytest.approx(dev_t * 100, rel=1e-2)


class TestClusteringCoefficient:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "id_a string, id_b string")

    def test_triangle_is_fully_clustered(self, spark):
        from niamoto_spark.operators.graph import clustering_coefficient

        e = self._edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        rows = {r["node_id"]: r for r in
                clustering_coefficient(e).collect()}
        assert all(rows[n]["lcc"] == 1.0 for n in "abc")
        assert all(rows[n]["n_triangles"] == 1 for n in "abc")

    def test_star_has_zero_lcc(self, spark):
        from niamoto_spark.operators.graph import clustering_coefficient

        e = self._edges(spark, [("hub", "x"), ("hub", "y"),
                                ("hub", "z")])
        rows = {r["node_id"]: r for r in
                clustering_coefficient(e).collect()}
        assert rows["hub"]["degree"] == 3 and rows["hub"]["lcc"] == 0.0
        assert rows["x"]["lcc"] == 0.0  # degree 1 -> defined as 0

    def test_paw_graph(self, spark):
        """Triangle a-b-c plus pendant d on a: lcc(a) = 2*1/(3*2)."""
        from niamoto_spark.operators.graph import clustering_coefficient

        e = self._edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                                ("a", "d")])
        rows = {r["node_id"]: r for r in
                clustering_coefficient(e).collect()}
        assert rows["a"]["lcc"] == pytest.approx(1 / 3)
        assert rows["b"]["lcc"] == 1.0
