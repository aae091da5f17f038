"""PMI collocations (operators/lm.py) and JSON schema-inference /
flattening (operators/semistructured.py)."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TestPmiCollocations:
    def test_hand_computed_pmi(self, spark):
        """Corpus of 4 docs where 'new york' always co-occurs:
        counts are exact and small enough to verify by hand."""
        from niamoto_spark.operators.lm import pmi_collocations

        rows = [(i, "new york " + ("is big " * 2).strip())
                for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {(r["a"], r["b"]): r for r in
               pmi_collocations(df, "doc_id", "text",
                                min_count=5).collect()}
        # per doc tokens: new york is big is big -> 6 tokens, 5 bigrams
        nu, nb = 30, 25
        r = out[("new", "york")]
        assert r["cab"] == 5
        expect = (math.log(5 / nb) - math.log(5 / nu)
                  - math.log(5 / nu))
        assert r["pmi"] == pytest.approx(expect, abs=1e-12)
        # 'big is' occurs once per doc = 5 times; both 'big' and 'is'
        # occur twice per doc = 10 times each
        r2 = out[("big", "is")]
        assert r2["pmi"] == pytest.approx(
            math.log(5 / nb) - math.log(10 / nu) - math.log(10 / nu),
            abs=1e-12)

    def test_min_count_prunes(self, spark):
        from niamoto_spark.operators.lm import pmi_collocations

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "c d")],
            "doc_id long, text string")
        pairs = {(r["a"], r["b"]) for r in
                 pmi_collocations(df, "doc_id", "text",
                                  min_count=2).collect()}
        assert pairs == {("a", "b")}

    def test_no_broadcast_of_full_vocab(self, spark):
        """Plan contract: the unigram side joined into the PMI compute
        is the min_count-pruned table, so rare tokens never reach the
        broadcast."""
        from niamoto_spark.operators.lm import pmi_collocations

        df = spark.createDataFrame(
            [(i, f"common pair rare{i}") for i in range(10)],
            "doc_id long, text string")
        out = pmi_collocations(df, "doc_id", "text", min_count=5)
        rows = out.collect()
        assert {(r["a"], r["b"]) for r in rows} == {("common", "pair")}


class TestSemiStructured:
    def test_infer_and_flatten_nested(self, spark):
        from niamoto_spark.operators.semistructured import flatten_json

        rows = [(1, '{"a": 1, "b": {"c": "x", "d": 2.5}}'),
                (2, '{"a": 7, "b": {"c": "y", "d": 0.5}}')]
        df = spark.createDataFrame(rows, "id long, js string")
        flat = flatten_json(df, "js")
        assert set(flat.columns) == {"id", "a", "b_c", "b_d"}
        got = {r["id"]: (r["a"], r["b_c"], r["b_d"])
               for r in flat.collect()}
        assert got[1] == (1, "x", 2.5)
        assert got[2] == (7, "y", 0.5)

    def test_malformed_rows_become_nulls(self, spark):
        from niamoto_spark.operators.semistructured import flatten_json

        df = spark.createDataFrame(
            [(1, '{"a": 1}'), (2, "not json"), (3, None)],
            "id long, js string")
        flat = flatten_json(df, "js")
        got = {r["id"]: r["a"] for r in flat.collect()}
        assert got == {1: 1, 2: None, 3: None}

    def test_type_widening_follows_spark_reader(self, spark):
        from niamoto_spark.operators.semistructured import (
            infer_json_schema)

        df = spark.createDataFrame(
            [(1, '{"v": 1}'), (2, '{"v": 2.5}')], "id long, js string")
        schema = infer_json_schema(df, "js")
        assert dict((f.name, f.dataType.simpleString())
                    for f in schema.fields)["v"] == "double"

    def test_explicit_schema_skips_inference(self, spark):
        from niamoto_spark.operators.semistructured import parse_json

        schema = T.StructType([T.StructField("k", T.LongType())])
        df = spark.createDataFrame([(1, '{"k": 5}')],
                                   "id long, js string")
        out = parse_json(df, "js", schema=schema, out_col="p")
        assert out.select(F.col("p.k")).first()[0] == 5

    def test_empty_input_infers_empty_schema(self, spark):
        from niamoto_spark.operators.semistructured import (
            infer_json_schema)

        df = spark.createDataFrame([], "id long, js string")
        assert infer_json_schema(df, "js").fields == []

    def test_flatten_is_shuffle_free(self, spark):
        from niamoto_spark.operators.semistructured import flatten_json

        df = spark.createDataFrame([(1, '{"a": 1}')],
                                   "id long, js string")
        plan = flatten_json(df, "js")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestVariant:
    def test_typed_extraction(self, spark):
        from niamoto_spark.operators.semistructured import (
            to_variant, variant_extract)

        df = spark.createDataFrame(
            [(1, '{"k": 5, "tags": [7, 8], "s": "x"}')],
            "id long, js string")
        v = to_variant(df, "js", out_col="pv")
        x = variant_extract(v, "pv", {
            "k": ("$.k", "bigint"),
            "t0": ("$.tags[0]", "bigint"),
            "s": ("$.s", "string")}).first()
        assert (x["k"], x["t0"], x["s"]) == (5, 7, "x")

    def test_missing_path_and_type_mismatch_null(self, spark):
        from niamoto_spark.operators.semistructured import (
            to_variant, variant_extract)

        df = spark.createDataFrame([(1, '{"k": "not a number"}')],
                                   "id long, js string")
        v = to_variant(df, "js", out_col="pv")
        x = variant_extract(v, "pv", {
            "k": ("$.k", "bigint"),
            "nope": ("$.absent", "bigint")}).first()
        assert x["k"] is None and x["nope"] is None

    def test_heterogeneous_shapes_one_column(self, spark):
        """The VARIANT point: rows with different shapes coexist
        without a unioned struct schema."""
        from niamoto_spark.operators.semistructured import (
            to_variant, variant_extract)

        df = spark.createDataFrame(
            [(1, '{"a": 1}'), (2, '{"b": {"c": 2}}')],
            "id long, js string")
        v = to_variant(df, "js", out_col="pv")
        x = {r["id"]: r for r in variant_extract(v, "pv", {
            "a": ("$.a", "bigint"),
            "c": ("$.b.c", "bigint")}).collect()}
        assert x[1]["a"] == 1 and x[1]["c"] is None
        assert x[2]["c"] == 2 and x[2]["a"] is None
