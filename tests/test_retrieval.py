"""bm25_topk: parity with an independent pure-python BM25 on a small
corpus, distinct-query-term semantics, and the broadcast-only plan shape."""

import math
import re

import pytest
from pyspark.sql import functions as F

from niamoto_spark.operators.retrieval import bm25_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog outpaces a quick fox"),
    (2, "lorem ipsum dolor sit amet"),
    (3, "the dog sat on the log"),
    (4, ""),
]
QUERIES = [("q1", "quick dog"), ("q2", "fox fox FOX")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    tok = {d: [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
           for d, txt in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in tok.values()) / n
    out = {}
    for qid, qtxt in queries:
        terms = set(t for t in re.split(r"[^a-z0-9]+", qtxt.lower()) if t)
        scores = {}
        for d, toks in tok.items():
            s = 0.0
            for t in terms:
                tf = toks.count(t)
                if not tf:
                    continue
                df = sum(1 for v in tok.values() if t in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl))
            if s > 0:
                scores[d] = round(s, 6)
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    queries = spark.createDataFrame(QUERIES, ["query_id", "query_text"])
    return bm25_topk(docs, queries, k=10)


def test_python_parity(result):
    want = _py_bm25(DOCS, QUERIES)
    got = {}
    for row in result.collect():
        got.setdefault(row["query_id"], []).append(
            (row["doc_id"], row["score"], row["rank"]))
    for qid, ranked in want.items():
        mine = sorted(got[qid], key=lambda r: r[2])
        assert [(d, s) for d, s, _ in mine] == ranked


def test_distinct_term_semantics(result):
    """'fox fox FOX' must score identically to a single 'fox' term."""
    rows = {r["doc_id"]: r["score"]
            for r in result.where(F.col("query_id") == "q2").collect()}
    docs_with_fox = {0, 1}
    assert set(rows) == docs_with_fox


def test_empty_doc_excluded(result):
    assert result.where(F.col("doc_id") == 4).count() == 0


def test_plan_broadcast_only(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    queries = spark.createDataFrame(QUERIES, ["query_id", "query_text"])
    plan = (bm25_topk(docs, queries)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
