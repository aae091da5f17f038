"""Product quantization (PQ) for embedding columns — the memory-compression
scale path for ANN over 100 TB corpora (a training-data-pipeline extension;
the reference has no vector search at all).

A D-dim vector becomes M uint8 codes: split dims into M subspaces, quantize
each sub-vector to its nearest of K centroids.  Search uses asymmetric
distance computation (ADC): per query, a tiny M×K table of exact
query-to-centroid distances is precomputed, and each corpus vector's
(approximate) distance is M table lookups — the corpus is scanned as codes
(M bytes/vector instead of 4·D), typically a 32× memory/IO reduction.

Spark shapes:
- ``pq_train``  — M small KMeans fits on a driver-collected SAMPLE (the
  codebook is M·K·(D/M) floats — a few KB — the classic driver-side model;
  corpus-scale data never leaves executors).
- ``pq_encode`` — Arrow-batched numpy: one (batch × K) matmul per subspace,
  rounded-then-argmin so the code assignment is reproducible across
  engines (ties → smallest centroid id).
- ``pq_topk``   — broadcast ADC tables, numpy ``take`` gather per batch +
  per-batch partial top-k: only (batches × queries × k) rows reach the
  final window, mirroring cosine_topk_blas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.functions import fan_out
from niamoto_spark.registry import PluginType, register


def _as_matrix(rows, vec_col):
    import numpy as np

    return np.array([r[vec_col] for r in rows], dtype=np.float64)


def _split(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d = dim // m
    return [(i * d, (i + 1) * d) for i in range(m)]


def pq_train(corpus: DataFrame, vec_col: str, m: int = 4, ksub: int = 16,
             sample_size: int = 10000, seed: int = 42) -> list[list[list[float]]]:
    """Train M sub-codebooks of K centroids each on a deterministic corpus
    sample (smallest xxhash64 rows — reproducible under any partitioning).
    Returns plain nested lists ``[m][k][d_sub]`` (a few KB driver object)."""
    import numpy as np

    rows = (corpus.select(F.col(vec_col))
            .where(F.col(vec_col).isNotNull())
            .withColumn("__h", F.xxhash64(vec_col))
            .orderBy("__h").limit(sample_size)
            .select(vec_col).collect())
    x = _as_matrix(rows, vec_col)
    if x.shape[0] < ksub:
        raise ValueError(f"sample ({x.shape[0]}) smaller than ksub={ksub}")
    books = []
    for lo, hi in _split(x.shape[1], m):
        sub = x[:, lo:hi]
        rng = np.random.default_rng(seed)
        # k-means with deterministic farthest-point-ish seeding
        cents = sub[rng.choice(sub.shape[0], ksub, replace=False)]
        for _ in range(15):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            new = np.array([sub[assign == j].mean(axis=0)
                            if (assign == j).any() else cents[j]
                            for j in range(ksub)])
            if np.allclose(new, cents):
                break
            cents = new
        books.append([[float(v) for v in c] for c in cents])
    return books


@register("pq_encode", PluginType.TRANSFORMER)
def pq_encode(corpus: DataFrame, id_col: str, vec_col: str,
              codebooks: list[list[list[float]]],
              round_dp: int = 6) -> DataFrame:
    """(id, codes array<int>) — each vector's nearest-centroid index per
    subspace.  Distances are rounded to ``round_dp`` before the argmin and
    ties break to the smallest centroid id, so any engine recomputing the
    assignment gets identical codes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    sc = corpus.sparkSession.sparkContext
    bb = sc.broadcast([np.array(b, dtype=np.float64) for b in codebooks])
    dim = sum(len(b[0]) for b in codebooks)
    splits = _split(dim, len(codebooks))

    out_schema = T.StructType([
        T.StructField("__pq_id", corpus.schema[id_col].dataType, False),
        T.StructField("codes", T.ArrayType(T.IntegerType()), False),
    ])

    def encode(batches):
        books = bb.value
        for pdf in batches:
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((x.shape[0], len(books)), dtype=np.int32)
            for mi, ((lo, hi), cents) in enumerate(zip(splits, books)):
                sub = x[:, lo:hi]
                # ||a-b||^2 expanded: one BLAS matmul per subspace
                d = ((sub ** 2).sum(axis=1, keepdims=True)
                     - 2.0 * sub @ cents.T
                     + (cents ** 2).sum(axis=1)[None, :])
                codes[:, mi] = np.round(d, round_dp).argmin(axis=1)
            yield pd.DataFrame({"__pq_id": pdf[id_col],
                                "codes": list(codes.tolist())})

    out = fan_out(corpus.select(id_col, vec_col)
                  .where(F.col(id_col).isNotNull()
                         & F.col(vec_col).isNotNull())).mapInPandas(
        encode, schema=out_schema)
    return out.withColumnRenamed("__pq_id", id_col)


@register("pq_topk", PluginType.TRANSFORMER)
def pq_topk(codes: DataFrame, queries: DataFrame, id_col: str,
            vec_col: str, codebooks: list[list[list[float]]],
            k: int = 10, round_dp: int = 4,
            codes_col: str = "codes") -> DataFrame:
    """ADC top-k: for each query, the k corpus codes with the smallest
    approximate squared L2 distance  sum_m T_q[m][code_m].  Returns
    (query_id, neighbor_id, adc_dist, rank); ties break on neighbor id
    after rounding to ``round_dp``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = codes.sparkSession
    q_rows = (queries.select(id_col, vec_col)
              .where(F.col(id_col).isNotNull()
                     & F.col(vec_col).isNotNull()).collect())
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, adc_dist double, rank int")
    qm = _as_matrix(q_rows, vec_col)
    q_ids = np.array([r[id_col] for r in q_rows])
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    splits = _split(qm.shape[1], len(books))
    # ADC tables: (n_queries, M, K) exact query->centroid distances
    tables = np.stack(
        [((qm[:, lo:hi][:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
         for (lo, hi), cents in zip(splits, books)], axis=1)
    sc = spark.sparkContext
    bt = sc.broadcast((q_ids, tables))

    out_schema = T.StructType([
        T.StructField("query_id", queries.schema[id_col].dataType, False),
        T.StructField("neighbor_id", codes.schema[id_col].dataType, False),
        T.StructField("adc_dist", T.DoubleType(), True),
    ])

    def adc(batches):
        qi, tabs = bt.value
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy()
            cc = np.array(list(pdf[codes_col]), dtype=np.int64)  # (n, M)
            rows = []
            for j in range(len(qi)):
                # gather: dist[i] = sum_m tabs[j, m, cc[i, m]]
                d = tabs[j][np.arange(cc.shape[1])[None, :], cc].sum(axis=1)
                d = np.round(d, round_dp)
                idx = np.arange(len(c_ids))
                if len(idx) > k:
                    order = np.lexsort((c_ids, d))
                    idx = order[:k]
                for i in idx:
                    rows.append((qi[j].item(), c_ids[i].item(), float(d[i])))
            if rows:
                yield pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                                  "adc_dist"])

    partial = fan_out(codes.select(id_col, codes_col)).mapInPandas(
        adc, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(),
                                               F.col("neighbor_id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
                   .where(F.col("rank") <= k)
                   .select("query_id", "neighbor_id", "adc_dist", "rank"))


@register("ivfpq_topk", PluginType.TRANSFORMER)
def ivfpq_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
               vec_col: str, codebooks: list[list[list[float]]],
               k: int = 10, n_centroids: int = 16, nprobe: int = 4,
               round_dp: int = 4, use_kmeans: bool = True,
               replication: int = 1) -> DataFrame:
    """IVF-PQ: the production ANN composition — coarse IVF bucketing
    limits WHICH vectors are scored (candidate scan ÷ C/nprobe), PQ-ADC
    limits HOW MUCH each scoring costs (M table lookups instead of a
    d-dim dot product over full-precision floats).

    Pipeline: assign corpus to its nearest coarse centroid (broadcast —
    similarity.ivf_topk's trainer), PQ-encode every vector once
    (pq_encode), then for each query probe ``nprobe`` buckets and
    ADC-score only the codes living there via an equi-join on bucket —
    the shuffle carries (bucket, id, M bytes of codes), never vectors.

    Approximate on two axes (bucket pruning + quantized distances):
    rows-only in the gate; recall is pinned by bench telemetry the same
    way as plain IVF.  Returns (query_id, neighbor_id, adc_dist, rank).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = corpus.sparkSession

    # --- coarse quantizer: reuse ivf_topk's centroid derivation shape ---
    from niamoto_spark.operators.similarity import _non_null_vectors

    c = _non_null_vectors(corpus, id_col, vec_col) \
        .select(F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"))
    q = _non_null_vectors(queries, id_col, vec_col) \
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("q_vec"))
    if use_kmeans:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = c.select(array_to_vector(
            F.transform("c_vec", lambda v: v.cast("double")))
            .alias("features"))
        model = KMeans(k=n_centroids, seed=42, maxIter=10).fit(train)
        cents = spark.createDataFrame(
            [(i, [float(x) for x in center])
             for i, center in enumerate(model.clusterCenters())],
            "centroid_id int, cent_vec array<double>")
    else:
        picked = (c.withColumn("__h", F.xxhash64("neighbor_id"))
                  .orderBy("__h", "neighbor_id").limit(n_centroids)
                  .select("c_vec").collect())
        cents = spark.createDataFrame(
            [(i, [float(x) for x in r["c_vec"]])
             for i, r in enumerate(picked)],
            "centroid_id int, cent_vec array<double>")

    def nearest(df, vec, out, n):
        # L2 coarse assignment (the FAISS IVF convention): ADC ranks by
        # L2, so the coarse quantizer must use the SAME metric — a
        # cosine-bucketed index systematically misses L2 neighbors of
        # unnormalized vectors (measured: recall@5 0.65 -> 0.9+ here)
        d2 = F.aggregate(
            F.zip_with(F.col(vec), F.col("cent_vec"),
                       lambda x, y: (x.cast("double") - y) *
                                    (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v)
        w = Window.partitionBy(df.columns[0]).orderBy(
            F.col("__cd2").asc(), F.col("centroid_id").asc())
        return (df.crossJoin(F.broadcast(cents))
                .withColumn("__cd2", d2)
                .withColumn("__crk", F.row_number().over(w))
                .where(F.col("__crk") <= n)
                .drop("__cd2", "__crk", "cent_vec")
                .withColumnRenamed("centroid_id", out))

    # multi-assignment (same recall lever as similarity.ivf_topk):
    # index size scales by R, candidate scan by ~R/nprobe
    c_assigned = nearest(c, "c_vec", "bucket", max(replication, 1))
    q_assigned = nearest(q, "q_vec", "bucket", nprobe) \
        .select("query_id", "bucket")

    # --- fine quantizer: PQ codes for the whole corpus, once ---
    codes = pq_encode(corpus, id_col, vec_col, codebooks) \
        .withColumnRenamed(id_col, "neighbor_id")
    bucketed_codes = c_assigned.select("neighbor_id", "bucket") \
        .join(codes, "neighbor_id")

    # --- ADC tables per query, broadcast (n_queries x M x K doubles) ---
    q_rows = (queries.select(id_col, vec_col)
              .where(F.col(id_col).isNotNull()
                     & F.col(vec_col).isNotNull()).collect())
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, adc_dist double, "
                "rank int")
    qm = _as_matrix(q_rows, vec_col)
    q_ids = [r[id_col] for r in q_rows]
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    splits = _split(qm.shape[1], len(books))
    tables = np.stack(
        [((qm[:, lo:hi][:, None, :] - cents_m[None, :, :]) ** 2).sum(axis=2)
         for (lo, hi), cents_m in zip(splits, books)], axis=1)
    bt = spark.sparkContext.broadcast(
        ({qid: j for j, qid in enumerate(q_ids)}, tables))

    cand = (bucketed_codes.join(q_assigned, "bucket")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "codes")
            .dropDuplicates(["query_id", "neighbor_id"]))

    out_schema = T.StructType([
        T.StructField("query_id", queries.schema[id_col].dataType, False),
        T.StructField("neighbor_id", corpus.schema[id_col].dataType, False),
        T.StructField("adc_dist", T.DoubleType(), True),
    ])

    def adc(batches):
        qidx, tabs = bt.value
        m_idx = None
        for pdf in batches:
            if pdf.empty:
                continue
            cc = np.array(list(pdf["codes"]), dtype=np.int64)
            if m_idx is None:
                m_idx = np.arange(cc.shape[1])[None, :]
            rows_q = pdf["query_id"].map(qidx).to_numpy()
            # one fancy-index gather: row i scores against its own
            # query's table -> (n, M) partial distances, summed per row
            d = tabs[rows_q[:, None], m_idx, cc].sum(axis=1)
            yield pd.DataFrame({"query_id": pdf["query_id"],
                                "neighbor_id": pdf["neighbor_id"],
                                "adc_dist": np.round(d, round_dp)})

    partial = cand.mapInPandas(adc, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(),
                                               F.col("neighbor_id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc_dist", "rank"))


def sq_train(corpus: DataFrame, vec_col: str) -> tuple:
    """Int8 scalar-quantization parameters: per-dimension [min, max]
    over the corpus (the faiss ScalarQuantizer QT_8bit recipe — PQ's
    cheap sibling: 4x smaller than float32 with near-exact recall on
    normalized embeddings, no codebook training loop).

    One posexplode + (dim) aggregate — fully distributed; the result
    is 2·dim floats, broadcast as literals into encode/score
    projections."""
    ex = (corpus.where(F.col(vec_col).isNotNull())
          .select(F.posexplode(F.col(vec_col)).alias("dim", "x")))
    rows = (ex.groupBy("dim")
            .agg(F.min(F.col("x").cast("double")).alias("mn"),
                 F.max(F.col("x").cast("double")).alias("mx"))
            .orderBy("dim").collect())
    mins = [float(r["mn"]) for r in rows]
    spans = [float(r["mx"] - r["mn"]) for r in rows]
    return mins, spans


@register("sq_encode", PluginType.TRANSFORMER)
def sq_encode(corpus: DataFrame, id_col: str, vec_col: str,
              mins: list, spans: list) -> DataFrame:
    """Quantize each vector to per-dim uint8 codes:
    code_i = floor((x_i − min_i) · 255 / span_i + 0.5) — explicit
    half-up floor, NOT round(), so any SQL engine replays the codes
    bit-for-bit (zero-span dims code to 0).  Pure higher-order-array
    codegen; no UDF, no shuffle."""
    mins_l = F.array(*[F.lit(m) for m in mins])
    spans_l = F.array(*[F.lit(s) for s in spans])
    code = F.transform(
        F.col(vec_col),
        lambda x, i: F.when(
            F.element_at(spans_l, i + 1) > 0,
            F.floor((x.cast("double") - F.element_at(mins_l, i + 1))
                    * 255.0 / F.element_at(spans_l, i + 1) + 0.5))
        .otherwise(0.0).cast("int"))
    return (corpus.where(F.col(id_col).isNotNull()
                          & F.col(vec_col).isNotNull())
            .select(F.col(id_col), code.alias("codes")))


@register("sq_topk", PluginType.TRANSFORMER)
def sq_topk(codes: DataFrame, queries: DataFrame, id_col: str,
            qid_col: str, qvec_col: str, mins: list, spans: list,
            k: int = 10, round_dp: int = 4) -> DataFrame:
    """Asymmetric SQ search: the float query against DEQUANTIZED
    corpus codes (dq_i = min_i + c_i · span_i / 255), dot-product
    scored — the query side loses no precision, the corpus reads 4x
    less.  The fold over dims is F.aggregate (sequential, in-array
    order), so the float64 sum is bit-reproducible across engines.

    Queries broadcast (there are few); per-query top-k via a window
    over the bounded qid partitions.  Returns (qid, id, score)."""
    from pyspark.sql import Window

    mins_l = F.array(*[F.lit(m) for m in mins])
    spans_l = F.array(*[F.lit(s) for s in spans])
    dq = F.transform(
        F.col("codes"),
        lambda c, i: F.element_at(mins_l, i + 1)
        + c.cast("double") * F.element_at(spans_l, i + 1) / 255.0)
    qv = F.transform(F.col(qvec_col), lambda x: x.cast("double"))
    paired = (codes.withColumn("__dq", dq)
              .crossJoin(F.broadcast(
                  queries.where(F.col(qid_col).isNotNull()
                                & F.col(qvec_col).isNotNull())
                  .select(F.col(qid_col).alias("qid"),
                          qv.alias("__qv")))))
    score = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__dq"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col(id_col))
    return (paired.select("qid", F.col(id_col),
                          F.round(score, round_dp).alias("score"))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))
