"""Model-evaluation metrics as exact set algebra — the offline eval
suite (AUC, calibration, ranking quality) a training pipeline runs on
held-out scores.  No sklearn, no sampling: every metric is closed-form
over aggregations, so results are exact and replay in SQL (q193-q195).

- binary_auc: Mann-Whitney rank-sum AUC with the midrank tie
  correction — the EXACT area, not a trapezoid approximation.  One
  aggregation per distinct score + one window over the (much smaller)
  score-value table.
- calibration_bins / brier: reliability diagram + Brier score in one
  aggregation pass.
- rank_metrics: NDCG@k / MRR / precision@k per query over an already
  top-k ranking frame joined to binary relevance labels.

No counterpart in the reference (its ml/ subsystem is out of engine
scope); extension-brief operators for the training-data lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("binary_auc", PluginType.TRANSFORMER)
def binary_auc(df: DataFrame, score_col: str, label_col: str,
               group_col: str | None = None) -> DataFrame:
    """Exact ROC-AUC via the rank-sum identity with midranks:

        AUC = (R+ - n+(n+ + 1)/2) / (n+ · n-)

    where R+ sums the (tie-averaged) ranks of positives.  The corpus
    aggregates to one row per DISTINCT score first, so the window
    ordering runs over score values, not rows — at 100 TB that table
    is as small as the score's resolution.  With ``group_col`` the
    whole computation slices per group (fairness / subgroup eval) at
    no extra shuffle.  Output: [group,] (auc, n_pos, n_neg)."""
    gcols = [group_col] if group_col else []
    per_score = (df.select(*gcols,
                           F.col(score_col).cast("double").alias("s"),
                           F.col(label_col).cast("long").alias("y"))
                 # an unlabeled row is NOT an implicit negative: sum(y)
                 # skips the NULL but count(*) would still tally it
                 .where(F.col("s").isNotNull() & F.col("y").isNotNull())
                 .groupBy(*gcols, "s")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("y").alias("np")))
    w = (Window.partitionBy(*gcols).orderBy("s")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = per_score.withColumn(
        "cum_before", F.sum("n").over(w) - F.col("n"))
    # midrank of a tied block starting after cum_before with n members
    avg_rank = F.col("cum_before") + (F.col("n") + 1) / 2.0
    agg = ranked.groupBy(*gcols).agg(
        F.sum(F.col("np") * avg_rank).alias("r_pos"),
        F.sum("np").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).alias("n_neg"))
    auc = ((F.col("r_pos")
            - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
           / (F.col("n_pos") * F.col("n_neg")))
    return agg.select(
        *gcols,
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc)
         .alias("auc"),
        "n_pos", "n_neg")


@register("calibration_bins", PluginType.TRANSFORMER)
def calibration_bins(df: DataFrame, prob_col: str, label_col: str,
                     n_bins: int = 10) -> DataFrame:
    """Reliability-diagram bins: predicted probability vs observed
    positive rate per equal-width bin, plus per-bin Brier contribution
    — ONE aggregation.  Output: (bin, n, avg_prob, frac_pos,
    brier_sum)."""
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("double")
    bin_ = F.least(F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1))
    return (df.where(p.isNotNull())
            .groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg(p).alias("avg_prob"),
                 F.avg(y).alias("frac_pos"),
                 F.sum((p - y) * (p - y)).alias("brier_sum")))


@register("rank_metrics", PluginType.TRANSFORMER)
def rank_metrics(ranking: DataFrame, relevance: DataFrame,
                 query_col: str = "query_id", doc_col: str = "doc_id",
                 rank_col: str = "rank", rel_col: str = "rel",
                 k: int = 10) -> DataFrame:
    """NDCG@k, MRR and precision@k per query from a top-k ranking
    frame and binary relevance labels.  IDCG uses the total relevant
    count per query (ideal = all relevant first), so NDCG is the true
    normalized value even when relevant docs fall outside the top-k.
    All log2 algebra is closed-form; one join + two aggregations."""
    r = (ranking.where(F.col(rank_col) <= k)
         .join(relevance.select(F.col(query_col),
                                F.col(doc_col),
                                F.col(rel_col).cast("double")
                                .alias("__rel")),
               [query_col, doc_col], "left")
         .na.fill({"__rel": 0.0}))
    dcg_term = F.col("__rel") / F.log2(F.col(rank_col) + 1.0)
    rr_term = F.when(F.col("__rel") > 0,
                     1.0 / F.col(rank_col)).otherwise(F.lit(0.0))
    per_q = (r.groupBy(query_col)
             .agg(F.sum(dcg_term).alias("dcg"),
                  F.max(rr_term).alias("mrr"),
                  (F.sum("__rel") / F.lit(float(k))).alias("p_at_k")))
    # ideal DCG from the query's TOTAL relevant count, capped at k
    totals = (relevance.where(F.col(rel_col) > 0)
              .groupBy(query_col)
              .agg(F.least(F.count(F.lit(1)), F.lit(k)).alias("n_rel")))
    # sum_{i=1..n} 1/log2(i+1) via an inline sequence — n <= k, tiny
    idcg = F.expr(
        "aggregate(sequence(1, n_rel), cast(0.0 as double), "
        "(acc, i) -> acc + 1.0 / log2(i + 1.0))")
    return (per_q.join(totals, query_col, "left")
            .select(query_col,
                    F.when(F.col("n_rel") > 0,
                           F.col("dcg") / idcg)
                    .otherwise(F.lit(0.0)).alias("ndcg"),
                    "mrr", "p_at_k"))


@register("gains_table", PluginType.TRANSFORMER)
def gains_table(df: DataFrame, score_col: str, label_col: str,
                n_bins: int = 10) -> DataFrame:
    """Decile gains / lift table: rows bucketed by equal-width score
    bins (highest scores first), reporting per-bin positive capture
    and the CUMULATIVE capture rate and lift the campaign-targeting
    readout needs ("top 2 deciles capture 60% of positives, lift 3x").
    One aggregation + one window over the (n_bins-row) bin table.
    Output: (bin, n, n_pos, capture_rate, cum_capture, cum_lift) with
    bin 1 = highest scores."""
    p = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    bin_ = (F.lit(n_bins)
            - F.least(F.floor(p * n_bins).cast("int"),
                      F.lit(n_bins - 1)))
    per_bin = (df.where(p.isNotNull())
               .groupBy(bin_.alias("bin"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(y).alias("n_pos")))
    w_cum = (Window.orderBy("bin")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy()
    tot_pos = F.sum("n_pos").over(w_all)
    tot_n = F.sum("n").over(w_all)
    cum_pos = F.sum("n_pos").over(w_cum)
    cum_n = F.sum("n").over(w_cum)
    return (per_bin
            .select("bin", "n",
                    F.col("n_pos").cast("long").alias("n_pos"),
                    F.when(tot_pos > 0, F.col("n_pos") / tot_pos)
                    .otherwise(F.lit(0.0)).alias("capture_rate"),
                    F.when(tot_pos > 0, cum_pos / tot_pos)
                    .otherwise(F.lit(0.0)).alias("cum_capture"),
                    F.when((tot_pos > 0) & (cum_n > 0),
                           (cum_pos / cum_n) / (tot_pos / tot_n))
                    .alias("cum_lift")))


@register("conformal_interval", PluginType.TRANSFORMER)
def conformal_interval(df: DataFrame, pred_col: str, actual_col: str,
                       id_col: str, alpha: float = 0.1,
                       cal_frac: float = 0.5, seed: str = "conf",
                       round_dp: int = 4) -> DataFrame:
    """Split-conformal prediction interval with finite-sample
    guarantee: an md5-deterministic calibration split supplies the
    |actual − pred| residuals, q̂ is the ⌈(n+1)(1−α)⌉-th SMALLEST
    residual (exact order statistic, tie-broken by id), and the test
    split reports empirical coverage of pred ± q̂ — which the
    conformal theorem lower-bounds by 1−α regardless of the model.

    Distribution: the split is a pure md5 expression (reproducible,
    pushes to the scan); the order statistic uses the shared
    TWO-PHASE distributed rank (operators/ranks.py — the calibration
    half is corpus-sized, so no single-partition window ever sees
    it); coverage is one aggregate.
    Returns ONE row: (n_cal, n_test, qhat, coverage, alpha).
    """
    from niamoto_spark.operators.ranks import global_rank

    # the md5-coin pin: NULL ids can't be split deterministically, and
    # a NULL actual/pred has no conformity score
    df = df.where(F.col(id_col).isNotNull()
                  & F.col(actual_col).isNotNull()
                  & F.col(pred_col).isNotNull())
    key = F.col(id_col).cast("string")
    h = F.conv(F.substring(
        F.md5(F.concat_ws("|", F.lit(seed), key)), 1, 13),
        16, 10).cast("double")
    uni = (h + 0.5) / F.lit(float(16 ** 13))
    base = (df.withColumn("__cal", uni < cal_frac)
            .withColumn("__r", F.abs(F.col(actual_col)
                                     - F.col(pred_col))))
    cal = base.where(F.col("__cal"))
    n_cal = cal.count()
    if n_cal == 0:
        raise ValueError("conformal_interval: empty calibration split")
    import math as _m

    k = min(int(_m.ceil((n_cal + 1) * (1.0 - alpha))), n_cal)
    qhat = (global_rank(cal.select("__r", id_col),
                        [F.col("__r").asc(), F.col(id_col).asc()],
                        out_col="__rn")
            .where(F.col("__rn") == k).select("__r").first()[0])
    test = base.where(~F.col("__cal"))
    return (test.agg(
        F.lit(n_cal).alias("n_cal"),
        F.count(F.lit(1)).alias("n_test"),
        F.round(F.lit(float(qhat)), round_dp).alias("qhat"),
        F.round(F.avg((F.col("__r") <= F.lit(float(qhat)))
                      .cast("double")), round_dp).alias("coverage"),
        F.lit(float(alpha)).alias("alpha")))


@register("confusion_stats", PluginType.TRANSFORMER)
def confusion_stats(df: DataFrame, actual_col: str, pred_col: str,
                    round_dp: int = 4) -> DataFrame:
    """Multi-class confusion summary: per class, support (actual n),
    predicted n, true positives, precision, recall, F1 — the
    first table read after any classifier run (binary_auc covers
    threshold-free binary ranking; this is the thresholded
    multi-class complement).

    One (actual, pred) aggregate, then two marginal rollups joined
    back on the class — three narrow aggregations over the confusion
    matrix, never the raw rows twice.  Classes seen only in
    predictions appear with support 0.  Division by zero yields 0.0
    (the sklearn zero_division=0 convention)."""
    cm = (df.groupBy(F.col(actual_col).alias("actual"),
                     F.col(pred_col).alias("pred"))
          .agg(F.count(F.lit(1)).alias("n")))
    support = (cm.groupBy(F.col("actual").alias("cls"))
               .agg(F.sum("n").alias("support")))
    predn = (cm.groupBy(F.col("pred").alias("cls"))
             .agg(F.sum("n").alias("pred_n")))
    tp = (cm.where(F.col("actual") == F.col("pred"))
          .select(F.col("actual").alias("cls"), F.col("n").alias("tp")))
    base = (support.join(predn, "cls", "full_outer")
            .join(tp, "cls", "left")
            .fillna({"support": 0, "pred_n": 0, "tp": 0}))
    prec = F.when(F.col("pred_n") > 0,
                  F.col("tp") / F.col("pred_n")).otherwise(0.0)
    rec = F.when(F.col("support") > 0,
                 F.col("tp") / F.col("support")).otherwise(0.0)
    f1 = F.when(prec + rec > 0,
                2 * prec * rec / (prec + rec)).otherwise(0.0)
    return base.select(
        F.col("cls").alias("class"), "support", "pred_n", "tp",
        F.round(prec, round_dp).alias("precision"),
        F.round(rec, round_dp).alias("recall"),
        F.round(f1, round_dp).alias("f1"))


@register("multilabel_metrics", PluginType.TRANSFORMER)
def multilabel_metrics(df: DataFrame, actual_col: str, pred_col: str,
                       round_dp: int = 4) -> DataFrame:
    """Multi-label classification metrics over array columns: micro
    precision/recall/F1 (TP/FP/FN summed over all (row, label) pairs)
    and mean per-row Jaccard (the 'subset accuracy' relaxation) — the
    numbers a tagger/moderation model is actually graded on, where
    confusion_stats' single-label frame cannot apply.

    Row-local set algebra (array_distinct + array_intersect) in one
    projection, one global aggregate — no explode, no shuffle beyond
    the final single-row reduce.  NULL arrays count as empty."""
    a = F.array_distinct(F.coalesce(F.col(actual_col), F.array()))
    p = F.array_distinct(F.coalesce(F.col(pred_col), F.array()))
    tp = F.size(F.array_intersect(a, p)).cast("double")
    na, np_ = F.size(a).cast("double"), F.size(p).cast("double")
    uni = na + np_ - tp
    jac = F.when(uni > 0, tp / uni).otherwise(1.0)   # both empty: perfect
    agg = (df.select(tp.alias("tp"), na.alias("na"), np_.alias("np"),
                     jac.alias("jac"))
           .agg(F.sum("tp").alias("TP"), F.sum("na").alias("NA_"),
                F.sum("np").alias("NP_"), F.avg("jac").alias("mj"),
                F.count(F.lit(1)).alias("n_rows")))
    prec = F.when(F.col("NP_") > 0, F.col("TP") / F.col("NP_")) \
        .otherwise(0.0)
    rec = F.when(F.col("NA_") > 0, F.col("TP") / F.col("NA_")) \
        .otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)) \
        .otherwise(0.0)
    return agg.select(
        "n_rows", F.col("TP").cast("long").alias("tp"),
        (F.col("NP_") - F.col("TP")).cast("long").alias("fp"),
        (F.col("NA_") - F.col("TP")).cast("long").alias("fn"),
        F.round(prec, round_dp).alias("micro_precision"),
        F.round(rec, round_dp).alias("micro_recall"),
        F.round(f1, round_dp).alias("micro_f1"),
        F.round(F.col("mj"), round_dp).alias("mean_jaccard"))


@register("forecast_accuracy", PluginType.TRANSFORMER)
def forecast_accuracy(df: DataFrame, key_col: str, actual_col: str,
                      pred_col: str, naive_err_col: str,
                      round_dp: int = 4) -> DataFrame:
    """Forecast accuracy per series: sMAPE (bounded percentage error)
    and MASE (error scaled by a naive baseline's in-sample MAE — the
    Hyndman-Koehler recommendation: MASE < 1 means the model beats
    the naive forecaster, comparable ACROSS series of any scale,
    which raw MAPE is not).

    ``naive_err_col`` carries each row's |naive error| (e.g.
    |y_t − y_{t−1}| from a lag window upstream) so the operator stays
    one aggregate.  Returns (key, n, mae, smape, mase)."""
    a = F.col(actual_col).cast("double")
    p = F.col(pred_col).cast("double")
    ae = F.abs(a - p)
    sm = F.when(F.abs(a) + F.abs(p) > 0,
                2 * ae / (F.abs(a) + F.abs(p))).otherwise(0.0)
    agg = (df.groupBy(F.col(key_col).alias("key"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.avg(ae).alias("mae"),
                F.avg(sm).alias("smape"),
                F.avg(F.col(naive_err_col).cast("double"))
                .alias("naive_mae")))
    return agg.select(
        F.col("key").alias(key_col), "n",
        F.round("mae", round_dp).alias("mae"),
        F.round("smape", round_dp).alias("smape"),
        F.round(F.when(F.col("naive_mae") > 0,
                       F.col("mae") / F.col("naive_mae"))
                .otherwise(0.0), round_dp).alias("mase"))
