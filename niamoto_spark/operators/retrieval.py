"""BM25 keyword retrieval over a document corpus — a training-data-pipeline
extension (no counterpart in the reference, which has no full-text search;
SURVEY §2.4).  Used in practice for quality-ranked corpus sampling and for
retrieval-based decontamination audits.

Spark-first design, all JVM expressions, scale shape:

    tokens+dl = one corpus projection (dl carried through the explode, so
                document length never needs a per-doc join back)
    postings  = explode → groupBy(doc, token) — the ONE corpus shuffle
    df        = postings ⋈ broadcast(query tokens) → groupBy(token) — df is
                computed only for query terms, never the full vocabulary
    score     = candidate postings ⋈ broadcast(df) ⋈ broadcast(corpus stats)
                → groupBy(query, doc)
    top-k     = row_number over (query) on (score desc, doc asc)

The corpus shuffles exactly once (postings build); everything query-sided
is broadcast.  The per-query candidate set is only the docs sharing at
least one query term, so the final window sorts candidates per query,
never the corpus.

Tokenization is lowercase ``[^a-z0-9]+`` splitting — deliberately simple
and engine-portable so the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

_TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(text_col) -> "F.Column":
    return F.filter(F.split(F.lower(text_col), _TOKEN_SPLIT),
                    lambda t: t != "")


@register("bm25_topk", PluginType.TRANSFORMER)
def bm25_topk(docs: DataFrame, queries: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", query_id: str = "query_id",
              query_text: str = "query_text", k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              round_dp: int = 6) -> DataFrame:
    """Top-k documents per query under BM25 (Robertson/Sparck-Jones idf
    with the +1 smooth, i.e. the Lucene formulation).  Duplicate query
    terms count once (distinct-term semantics).  Ties broken by doc id
    after rounding the score to ``round_dp`` (so rank order is reproducible across
    engines).  Returns (query_id, doc_id, score, rank)."""
    # retrieval is over identified docs with text: a NULL id can't be
    # returned and a NULL text has no terms but would still skew
    # n_docs/avgdl differently across engines
    docs = docs.where(F.col(id_col).isNotNull()
                      & F.col(text_col).isNotNull())
    toks = (docs.select(F.col(id_col).alias("__doc"),
                        _tokens(F.col(text_col)).alias("__toks"))
                .withColumn("__dl", F.size("__toks")))
    postings = (toks
                .select("__doc", "__dl",
                        F.explode("__toks").alias("__tok"))
                .groupBy("__doc", "__dl", "__tok")
                .agg(F.count(F.lit(1)).alias("__tf")))
    # N and avgdl: one tiny aggregate (empty docs count toward both)
    corpus = toks.agg(F.count(F.lit(1)).alias("__n_docs"),
                      F.avg("__dl").alias("__avgdl"))

    qterms = (queries
              .select(F.col(query_id).alias("__q"),
                      F.explode(_tokens(F.col(query_text))).alias("__tok"))
              .distinct())
    qtokens = qterms.select("__tok").distinct()

    # document frequency, restricted to query terms (vocab never shuffles)
    dfreq = (postings.join(F.broadcast(qtokens), "__tok")
             .groupBy("__tok").agg(F.count(F.lit(1)).alias("__df")))

    scored = (postings
              .join(F.broadcast(qterms), "__tok")
              .join(F.broadcast(dfreq), "__tok")
              .crossJoin(F.broadcast(corpus)))
    idf = F.log(F.lit(1.0) + (F.col("__n_docs") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5))
    tf_part = (F.col("__tf") * (k1 + 1.0)
               / (F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl")
                                        / F.col("__avgdl"))))
    per_doc = (scored
               .groupBy("__q", "__doc")
               .agg(F.round(F.sum(idf * tf_part), round_dp).alias("score")))
    w = Window.partitionBy("__q").orderBy(F.desc("score"), F.asc("__doc"))
    return (per_doc
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("__q").alias(query_id),
                    F.col("__doc").alias(id_col), "score", "rank"))


@register("rrf_fuse", PluginType.TRANSFORMER)
def rrf_fuse(rankings: "list[DataFrame]", query_col: str = "query_id",
             doc_col: str = "doc_id", rank_col: str = "rank",
             k0: int = 60, topk: int = 10,
             round_dp: int = 6) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): hybrid-search's
    standard way to merge heterogeneous rankings (BM25 + dense ANN +
    recency...) without score calibration — each list contributes
    1/(k0 + rank) per (query, doc); absent docs contribute nothing.

    Distribution: a union of the (already top-k sized) ranking frames,
    one groupBy(query, doc) sum, and a per-query top-k window over
    candidates only — the corpus is never touched.  Ties after
    ``round_dp`` rounding break by doc id, so the fused order is
    engine-reproducible."""
    from functools import reduce

    from pyspark.sql import Window

    parts = [r.select(F.col(query_col).alias("__q"),
                      F.col(doc_col).alias("__d"),
                      (F.lit(1.0) / (F.lit(float(k0))
                                     + F.col(rank_col))).alias("__s"))
             for r in rankings]
    allr = reduce(lambda a, b: a.unionByName(b), parts)
    fused = (allr.groupBy("__q", "__d")
             .agg(F.round(F.sum("__s"), round_dp).alias("rrf"),
                  F.count(F.lit(1)).alias("n_lists")))
    w = Window.partitionBy("__q").orderBy(F.col("rrf").desc(),
                                          F.col("__d").asc())
    return (fused.withColumn("fused_rank", F.row_number().over(w))
            .where(F.col("fused_rank") <= topk)
            .select(F.col("__q").alias(query_col),
                    F.col("__d").alias(doc_col),
                    "rrf", "n_lists", "fused_rank"))


# ---------------------------------------------------------------------------
# Persisted full-text index — the lakehouse-native search index: the
# postings list materialized ONCE as a token-clustered manifest table
# (operators/annindex.py is the same pattern for vectors), so query
# time never re-scans the corpus.  Zone maps on the token column let a
# keyword lookup open only the files whose token range can contain it.
# ---------------------------------------------------------------------------

def _index_postings(docs: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
    toks = (docs.select(F.col(id_col).alias("doc"),
                        _tokens(F.col(text_col)).alias("tl"))
            .withColumn("dl", F.size("tl")))
    return (toks.select("doc", "dl", F.explode("tl").alias("token"))
            .groupBy("doc", "dl", "token")
            .agg(F.count(F.lit(1)).alias("tf")))


def save_text_index(docs: DataFrame, path: str, id_col: str = "doc_id",
                    text_col: str = "text",
                    index_files: int = 8) -> dict:
    """Build and persist the inverted index under ``path`` as three
    manifest tables: token-clustered postings (+ token zone maps),
    per-token document frequencies, and the 1-row corpus stats.  One
    corpus shuffle total — identical cost to a single transient BM25
    run, amortized over every future query batch."""
    from niamoto_spark.sources import manifest

    # same doc pin as bm25_topk: identified docs with text
    docs = docs.where(F.col(id_col).isNotNull()
                      & F.col(text_col).isNotNull())
    toks = (docs.select(F.col(id_col).alias("doc"),
                        _tokens(F.col(text_col)).alias("tl"))
            .withColumn("dl", F.size("tl")))
    postings = _index_postings(docs, id_col, text_col)
    clustered = (postings.repartition(index_files, "token")
                 .sortWithinPartitions("token", "doc"))
    manifest.overwrite_with_stats(clustered, f"{path}/postings",
                                  stats_cols=["token"])
    token_df = postings.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"))
    manifest.overwrite_with_stats(
        token_df.repartition(index_files, "token")
        .sortWithinPartitions("token"),
        f"{path}/token_df", stats_cols=["token"])
    stats = toks.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    manifest.overwrite(stats, f"{path}/stats")
    n_post = postings.count()
    return {"path": path, "n_postings": n_post,
            "index_files": index_files}


def query_text_index(spark, path: str, queries: DataFrame,
                     query_id: str = "query_id",
                     query_text: str = "query_text", k: int = 10,
                     k1: float = 1.2, b: float = 0.75,
                     round_dp: int = 6,
                     id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k against the STORED index — no corpus pass.  The
    query batch's distinct terms (driver-bounded: a query batch is
    human-sized) drive per-term zone-map-pruned reads of the postings
    table, so a lookup opens only files whose token range can contain
    a query term.  Scoring algebra is identical to bm25_topk — the
    equality is pinned in tests and q187's oracle refits it in SQL."""
    from functools import reduce

    from niamoto_spark.sources import manifest

    qterms = (queries
              .select(F.col(query_id).alias("__q"),
                      F.explode(_tokens(F.col(query_text)))
                      .alias("token"))
              .distinct())
    terms = sorted({r["token"] for r in
                    qterms.select("token").distinct().collect()})
    if not terms:
        return spark.createDataFrame(
            [], f"{query_id} string, {id_col} long, score double, "
                "rank int")
    reads = [manifest.read_table_pruned(spark, f"{path}/postings",
                                        "token", t, t)[0]
             for t in terms]
    reads = [r for r in reads if "token" in r.columns]
    if reads:
        cand = reduce(lambda a, b: a.unionByName(b), reads)
    else:
        cand = spark.createDataFrame(
            [], "doc long, dl int, token string, tf long")
    dfreq = manifest.read_table(spark, f"{path}/token_df") \
        .where(F.col("token").isin(terms))
    stats = manifest.read_table(spark, f"{path}/stats")
    scored = (cand.join(F.broadcast(qterms), "token")
              .join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1.0)
               / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                      / F.col("avgdl"))))
    per_doc = (scored.groupBy("__q", "doc")
               .agg(F.round(F.sum(idf * tf_part), round_dp)
                    .alias("score")))
    w = Window.partitionBy("__q").orderBy(F.desc("score"),
                                          F.asc("doc"))
    return (per_doc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("__q").alias(query_id),
                    F.col("doc").alias(id_col), "score", "rank"))


@register("rbo_similarity", PluginType.TRANSFORMER)
def rbo_similarity(a: DataFrame, b: DataFrame, key_col: str,
                   item_col: str, rank_col: str, depth: int = 10,
                   p: float = 0.9, round_dp: int = 4) -> DataFrame:
    """Rank-Biased Overlap (Webber et al. 2010) between two rankings
    per key, truncated at ``depth``:

        RBO = (1 − p) · Σ_{d=1..D} p^(d−1) · |A_d ∩ B_d| / d

    — the top-weighted ranking-similarity measure (Kendall tau treats
    rank 1 and rank 100 swaps alike; search/reco comparisons must
    not).  Items appearing in only one ranking contribute nothing,
    handling the non-conjoint case.

    Shape: both sides filtered to rank <= D (tiny), inner-joined on
    (key, item), then each matched item contributes
    Σ_{d >= max(ra, rb)} p^(d−1)/d — expanded over the CONSTANT depth
    range with one explode, one aggregate.  Returns (key, n_matched,
    rbo)."""
    ra = a.select(F.col(key_col).alias("key"),
                  F.col(item_col).alias("item"),
                  F.col(rank_col).alias("ra")).where(F.col("ra") <= depth)
    rb = b.select(F.col(key_col).alias("key"),
                  F.col(item_col).alias("item"),
                  F.col(rank_col).alias("rb")).where(F.col("rb") <= depth)
    m = ra.join(rb, ["key", "item"])
    start = F.greatest("ra", "rb")
    d = F.explode(F.sequence(start, F.lit(int(depth)))).alias("d")
    contrib = m.select("key", d).select(
        "key", (F.pow(F.lit(float(p)), F.col("d") - 1)
                / F.col("d")).alias("c"))
    per = (contrib.groupBy("key")
           .agg(F.round(F.sum("c") * (1 - float(p)), round_dp)
                .alias("rbo")))
    nm = m.groupBy("key").agg(F.count(F.lit(1)).alias("n_matched"))
    return (nm.join(per, "key", "left")
            .select(F.col("key").alias(key_col), "n_matched",
                    F.coalesce("rbo", F.lit(0.0)).alias("rbo")))
