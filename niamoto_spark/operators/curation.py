"""Corpus curation — the end-to-end training-data pipeline composition
(BASELINE.json north star): quality filter -> exact dedup -> near-dup
removal -> language filter -> sequence packing, as ONE lazy DataFrame
pipeline with per-stage accounting.

Each stage is the already-verified operator; this module only composes.
Laziness matters at scale: the stages fuse where Catalyst can (quality
signals + language + fingerprint are one projection pass), and the corpus
is only materialized at the points that need it (stage counts, LSH
self-join).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.operators.components import dedup_keep_components
from niamoto_spark.operators.dedup import dedup_exact_keep, minhash_lsh_candidates
from niamoto_spark.operators.text import (decontaminate_keep, lang_id,
                                          pack_sequences, repetition_stats,
                                          scrub_text, text_quality)
from niamoto_spark.registry import PluginType, register


@dataclass
class CurationConfig:
    min_quality: float = 0.5
    min_tokens: int = 5
    allowed_langs: list[str] | None = None     # None -> keep all
    near_dup_threshold: float = 0.5
    minhash_num_hashes: int = 64
    minhash_bands: int = 16
    shingle_k: int = 3
    # "xxhash64" (production, cheapest) or "md5" (the cross-engine
    # universal-hash family — lets an external engine recompute the
    # near-dup stage value-for-value; see dedup.minhash_lsh_candidates_md5)
    near_dup_hash: str = "xxhash64"
    scrub: bool = True
    seq_len: int = 2048
    # Gopher repetition thresholds (Rae et al. 2021 table A1 defaults)
    max_dup_line_frac: float = 0.3
    max_dup_para_frac: float = 0.3
    max_top_bigram_frac: float = 0.2
    # benchmark DataFrame + text column for the decontamination stage
    benchmark_df: object = None
    benchmark_text_col: str = "text"
    decontaminate_ngram: int = 13
    stages: list[str] = field(default_factory=lambda: [
        "quality", "exact_dedup", "near_dedup", "language", "scrub", "pack"])


@register("curate_corpus", PluginType.TRANSFORMER)
def curate_corpus(docs: DataFrame, id_col: str, text_col: str,
                  config: CurationConfig | None = None,
                  ) -> tuple[DataFrame, DataFrame]:
    """Run the curation pipeline; returns (curated_docs, stage_stats).

    ``curated_docs`` carries the original columns + quality/lang columns +
    (if packing) the pack assignment.  ``stage_stats`` is a small DataFrame
    (stage, docs_in, docs_out) — the per-stage retention record every
    corpus pipeline needs for its datasheet.
    """
    cfg = config or CurationConfig()
    spark = docs.sparkSession
    stats: list[tuple[str, int, int]] = []
    cur = docs
    cached: list[DataFrame] = []
    last_count: list[int | None] = [None]

    def account(stage: str, before: DataFrame, after: DataFrame) -> DataFrame:
        # cache each stage boundary: the count AND the next stage both
        # consume it — without this every stage re-executes the whole
        # upstream pipeline (and the LSH self-join would run it twice more).
        # docs_in is the PREVIOUS stage's cached docs_out (the stages
        # chain), so each accounting stage costs exactly one count job.
        after = after.cache()
        cached.append(after)
        n_in = last_count[0] if last_count[0] is not None else before.count()
        n_out = after.count()
        last_count[0] = n_out
        stats.append((stage, n_in, n_out))
        if len(cached) > 1:
            cached[-2].unpersist()
        return after

    def run_quality(d: DataFrame) -> DataFrame:
        scored = text_quality(d, text_col)
        return account("quality", d,
                       scored.where((F.col("quality_score") >= cfg.min_quality)
                                    & (F.col("n_tokens") >= cfg.min_tokens)))

    def run_exact(d: DataFrame) -> DataFrame:
        return account("exact_dedup", d, dedup_exact_keep(d, id_col, text_col))

    def run_near(d: DataFrame) -> DataFrame:
        if cfg.near_dup_hash == "md5":
            from niamoto_spark.operators.dedup import \
                minhash_lsh_candidates_md5

            pairs = minhash_lsh_candidates_md5(
                d, id_col, text_col, num_hashes=cfg.minhash_num_hashes,
                bands=cfg.minhash_bands, shingle_k=cfg.shingle_k,
                jaccard_threshold=cfg.near_dup_threshold)
        else:
            pairs = minhash_lsh_candidates(
                d, id_col, text_col, num_hashes=cfg.minhash_num_hashes,
                bands=cfg.minhash_bands, shingle_k=cfg.shingle_k,
                jaccard_threshold=cfg.near_dup_threshold)
        return account("near_dedup", d, dedup_keep_components(d, pairs, id_col))

    def run_language(d: DataFrame) -> DataFrame:
        if not cfg.allowed_langs:
            return d
        tagged = lang_id(d, text_col)
        return account("language", d,
                       tagged.where(F.col("lang_pred").isin(cfg.allowed_langs)))

    def run_scrub(d: DataFrame) -> DataFrame:
        return scrub_text(d, text_col) if cfg.scrub else d  # 1:1, no stats row

    def run_repetition(d: DataFrame) -> DataFrame:
        scored = repetition_stats(d, text_col, id_col=id_col)
        kept = scored.where(
            (F.col("dup_line_frac") <= cfg.max_dup_line_frac)
            & (F.col("dup_para_frac") <= cfg.max_dup_para_frac)
            & (F.col("top_bigram_frac") <= cfg.max_top_bigram_frac))
        return account("repetition", d, kept)

    def run_decontaminate(d: DataFrame) -> DataFrame:
        if cfg.benchmark_df is None:
            raise ValueError("decontaminate stage needs cfg.benchmark_df")
        return account("decontaminate", d, decontaminate_keep(
            d, id_col, text_col, cfg.benchmark_df, cfg.benchmark_text_col,
            ngram=cfg.decontaminate_ngram))

    def run_pack(d: DataFrame) -> DataFrame:
        packs = pack_sequences(d, id_col, text_col, seq_len=cfg.seq_len)
        return d.join(packs.select(id_col, "offset", "pack_first",
                                   "pack_last"), id_col)

    dispatch = {"quality": run_quality, "exact_dedup": run_exact,
                "near_dedup": run_near, "language": run_language,
                "scrub": run_scrub, "pack": run_pack,
                "repetition": run_repetition,
                "decontaminate": run_decontaminate}
    # stages run in the CONFIGURED order (e.g. scrub-before-quality scores
    # the scrubbed text) — not a fixed canonical order
    for stage in cfg.stages:
        if stage not in dispatch:
            raise ValueError(f"unknown curation stage {stage!r}; "
                             f"known: {sorted(dispatch)}")
        cur = dispatch[stage](cur)

    stats_df = spark.createDataFrame(
        stats or [("noop", 0, 0)], "stage string, docs_in long, docs_out long")
    return cur, stats_df


@register("mixture_rebalance", PluginType.TRANSFORMER)
def mixture_rebalance(df: DataFrame, id_col: str, group_col: str,
                      targets: "Mapping[str, float]", budget_rows: int,
                      seed: str = "mix",
                      round_dp: int = 6) -> tuple:
    """Rebalance a corpus to a TARGET mixture (30% web, 20% code, ...)
    under a row budget — the step between "measured the mix"
    (web.domain_mix / profiling) and "trained on it".

    Per group g: quota_g = floor(budget · p_g), rate_g = min(1,
    quota_g / n_g), and the rows kept are the deterministic md5(seed |
    id) uniform under rate_g — the stratified_sample coin, so the SAME
    rows are chosen on any engine/partitioning/rerun and a DuckDB
    oracle replays the exact selection.  Groups not named in
    ``targets`` are dropped (their target share is 0).  Undersupplied
    groups (n_g < quota_g) keep everything — the summary's
    ``shortfall`` column is the signal to go source more of that
    group, which no silent oversampling should paper over.

    Returns (selected_df, summary_df); summary is one row per target
    group: (group, n_avail, quota, rate, n_selected, shortfall)."""
    counts = {r["g"]: r["n"] for r in
              df.groupBy(F.col(group_col).alias("g"))
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    plan = []
    for g, share in targets.items():
        n_g = int(counts.get(g, 0))
        quota = int(budget_rows * float(share))
        rate = 1.0 if n_g <= quota else quota / n_g
        plan.append((g, n_g, quota, rate, max(0, quota - n_g)))
    rate_col = F.lit(None).cast("double")
    for g, _, _, rate, _ in plan:
        rate_col = F.when(F.col(group_col) == g,
                          F.lit(rate)).otherwise(rate_col)
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed),
                                      F.col(id_col).cast("string"))),
                    1, 8), 16, 10).cast("bigint")
    # NULL ids are never selected: concat_ws SKIPS a NULL id (every
    # such row would share the md5(seed) coin) while SQL's || yields
    # NULL and fails the comparison — pin the SQL behavior explicitly
    selected = (df.withColumn("__rate", rate_col)
                .where(F.col(id_col).isNotNull()
                       & F.col("__rate").isNotNull()
                       & (bucket < F.col("__rate")
                          * F.lit(float(2 ** 32))))
                .drop("__rate"))
    spark = df.sparkSession
    summary = spark.createDataFrame(
        [(g, n, q, r, s) for g, n, q, r, s in plan],
        f"{group_col} string, n_avail long, quota long, rate double, "
        "shortfall long")
    nsel = (selected.groupBy(F.col(group_col))
            .agg(F.count(F.lit(1)).alias("n_selected")))
    summary = (summary.join(nsel, group_col, "left")
               .fillna({"n_selected": 0})
               .select(group_col, "n_avail", "quota",
                       # SQL-side rounding (half-away) so an oracle's
                       # ROUND(quota/n) matches bit-for-bit
                       F.round("rate", round_dp).alias("rate"),
                       "n_selected", "shortfall"))
    return selected, summary


@register("temporal_split", PluginType.TRANSFORMER)
def temporal_split(df: DataFrame, ts_col: str, test_frac: float = 0.2,
                   embargo_s: float = 0.0) -> DataFrame:
    """Time-ordered train/test split with an EMBARGO gap (the
    financial-ML leakage guard, López de Prado's purging shape): the
    newest ``test_frac`` of rows by time become test, rows within
    ``embargo_s`` BEFORE the cutoff are dropped from train — features
    computed over trailing windows near the boundary would otherwise
    leak test-period information into training.

    The cutoff is the exact interpolated quantile of the timestamp
    (one percentile aggregate, no sort of the table); the split
    itself is a scan-side projection.  Appends ``split`` in
    {'train', 'embargo', 'test'} — random splits (split_assign) are
    WRONG for time series; this is the one to reach for."""
    t = F.col(ts_col).cast("double")
    cutoff = float(df.agg(
        F.percentile(t, F.lit(1.0 - float(test_frac)))).first()[0])
    split = (F.when(t > cutoff, "test")
             .when(t > cutoff - float(embargo_s), "embargo")
             .otherwise("train"))
    return df.withColumn("split", split)


@register("neyman_allocation", PluginType.TRANSFORMER)
def neyman_allocation(df: DataFrame, id_col: str, strata_col: str,
                      value_col: str, budget_rows: int,
                      seed: str = "ney",
                      round_dp: int = 6) -> tuple:
    """Variance-optimal stratified sampling (Neyman allocation):
    stratum h gets n_h = budget · N_h·S_h / Σ N_k·S_k of the sample —
    big AND noisy strata get more rows, so the stratified mean's
    variance is minimized for the budget (mixture_rebalance hits
    TARGET shares; this hits minimum-variance shares, the survey-
    statistics classic).

    One per-stratum (count, stddev_pop) aggregate sizes the plan; the
    draw is the deterministic md5(seed|id) coin under each stratum's
    rate, engine-replayable.  Degenerate strata (S_h = 0 or a single
    row) get rate 0 unless everything is degenerate.  Returns
    (selected_df, summary_df) with summary rows
    (stratum, n_avail, stddev, quota, rate, n_selected)."""
    # stddev is rounded SQL-side to 6dp BEFORE the quota arithmetic:
    # the raw float differs in last ulps across engines (summation
    # order), and int() truncation would amplify an ulp into an
    # off-by-one quota; on the 6dp grid both engines agree
    stats = {r["g"]: (int(r["n"]), float(r["s"] or 0.0)) for r in
             df.groupBy(F.col(strata_col).alias("g"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.stddev_pop(F.col(value_col)
                                       .cast("double")), 6)
                  .alias("s")).collect()}
    weight = {g: n * s for g, (n, s) in stats.items()}
    tot_w = sum(weight.values())
    plan = []
    # NULL is a legal stratum (SQL GROUP BY forms a NULL group); it
    # sorts FIRST in the plan, and its rate predicate must use isNull
    # (an equality test never matches NULL)
    for g, (n, s) in sorted(stats.items(),
                            key=lambda kv: (kv[0] is not None, kv[0])):
        quota = int(budget_rows * weight[g] / tot_w) if tot_w > 0 else 0
        rate = 0.0 if n == 0 else min(1.0, quota / n)
        plan.append((g, n, s, quota, rate))
    rate_col = F.lit(None).cast("double")
    for g, _, _, _, rate in plan:
        match = (F.col(strata_col).isNull() if g is None
                 else F.col(strata_col) == g)
        rate_col = F.when(match, F.lit(rate)).otherwise(rate_col)
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed),
                                      F.col(id_col).cast("string"))),
                    1, 8), 16, 10).cast("bigint")
    # NULL ids are never selected: concat_ws SKIPS a NULL id (every
    # such row would share the md5(seed) coin) while SQL's || yields
    # NULL and fails the comparison — pin the SQL behavior explicitly
    selected = (df.withColumn("__rate", rate_col)
                .where(F.col(id_col).isNotNull()
                       & F.col("__rate").isNotNull()
                       & (bucket < F.col("__rate")
                          * F.lit(float(2 ** 32))))
                .drop("__rate"))
    spark = df.sparkSession
    summary = spark.createDataFrame(
        [(g, n, s, q, r) for g, n, s, q, r in plan],
        f"{strata_col} string, n_avail long, stddev double, "
        "quota long, rate double")
    nsel = (selected.groupBy(F.col(strata_col))
            .agg(F.count(F.lit(1)).alias("n_selected")))
    summary = (summary.join(nsel, strata_col, "left")
               .fillna({"n_selected": 0})
               .select(strata_col, "n_avail", "stddev", "quota",
                       F.round("rate", round_dp).alias("rate"),
                       "n_selected"))
    return selected, summary
