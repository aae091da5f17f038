"""Closed-form distributed regression — multi-feature OLS by the
centered normal equations, no MLlib, no iteration: the per-group model
fit reduces to ONE aggregation of sufficient statistics plus scalar
algebra, so a million groups fit in a single shuffle and the entire
fit replays in SQL (q196's oracle).

Two passes for conditioning, not convergence: raw moment matrices of
big-magnitude features lose ~half the mantissa to cancellation in the
determinant; centering first (pass 1 = means, pass 2 = centered
cross-products) keeps every term O(n·var) and the 2x2 solve stable —
the standard numerically-safe formulation of bivariate OLS.

Extends q154's single-feature regr_* aggregates to two features +
optional ridge regularization.  No reference counterpart (SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("ols_fit2", PluginType.TRANSFORMER)
def ols_fit2(df: DataFrame, y_col: str, x1_col: str, x2_col: str,
             group_col: str, ridge: float = 0.0,
             round_dp: int = 6) -> DataFrame:
    """Per-group OLS  y = b0 + b1·x1 + b2·x2  (+ ridge λ on b1, b2).

    Centered solve:  [S11+λ  S12; S12  S22+λ] [b1 b2]ᵀ = [S1y  S2y]
    with Sij = Σ(xi - x̄i)(xj - x̄j), then b0 = ȳ - b1·x̄1 - b2·x̄2.
    R² = explained/total from the same centered sums.  Output per
    group: (b0, b1, b2, r2, n)."""
    g = F.col(group_col)
    means = (df.groupBy(group_col)
             .agg(F.avg(y_col).alias("my"), F.avg(x1_col).alias("m1"),
                  F.avg(x2_col).alias("m2")))
    j = df.join(F.broadcast(means), group_col)
    dy = F.col(y_col) - F.col("my")
    d1 = F.col(x1_col) - F.col("m1")
    d2 = F.col(x2_col) - F.col("m2")
    s = (j.groupBy(group_col)
         .agg(F.count(F.lit(1)).alias("n"),
              F.first("my").alias("my"), F.first("m1").alias("m1"),
              F.first("m2").alias("m2"),
              F.sum(d1 * d1).alias("s11"), F.sum(d1 * d2).alias("s12"),
              F.sum(d2 * d2).alias("s22"), F.sum(d1 * dy).alias("s1y"),
              F.sum(d2 * dy).alias("s2y"), F.sum(dy * dy).alias("syy")))
    lam = F.lit(float(ridge))
    det = (F.col("s11") + lam) * (F.col("s22") + lam) \
        - F.col("s12") * F.col("s12")
    # singular design (constant/collinear features, no ridge): report
    # null coefficients instead of tripping ANSI divide-by-zero
    safe_det = F.when(det != 0, det)
    b1 = (F.col("s1y") * (F.col("s22") + lam)
          - F.col("s2y") * F.col("s12")) / safe_det
    b2 = (F.col("s2y") * (F.col("s11") + lam)
          - F.col("s1y") * F.col("s12")) / safe_det
    b0 = F.col("my") - b1 * F.col("m1") - b2 * F.col("m2")
    r2 = F.when(F.col("syy") > 0,
                (b1 * F.col("s1y") + b2 * F.col("s2y")) / F.col("syy"))
    return s.select(group_col,
                    F.round(b0, round_dp).alias("b0"),
                    F.round(b1, round_dp).alias("b1"),
                    F.round(b2, round_dp).alias("b2"),
                    F.round(r2, round_dp).alias("r2"),
                    "n")


@register("robust_slope", PluginType.TRANSFORMER)
def robust_slope(df: DataFrame, x_col: str, y_col: str,
                 tiebreak_cols: "list[str]",
                 round_dp: int = 6) -> DataFrame:
    """Robust line fit in the Theil-Sen family: pair the x-sorted
    points (rank k with rank k + n/2), take the MEDIAN of the n/2
    pairwise slopes, then intercept = median(y − slope·x).  The
    half-offset pairing is the O(n) "split-sample" variant — one
    slope per point pair, wide x-separation (stable denominators),
    ~29% breakdown against outliers where OLS has 0%.

    Distribution: one exact global rank via the shared two-phase
    prefix sum (operators/ranks.py — NO single-partition window), one
    equi self-join on rank+offset, two exact medians.  Driver state =
    one long per partition.  Deterministic under ties via
    ``tiebreak_cols``; replays exactly in SQL.  Returns ONE row
    (n, n_pairs, slope, intercept)."""
    from niamoto_spark.operators.ranks import global_rank

    pts = (df.select(F.col(x_col).cast("double").alias("x"),
                     F.col(y_col).cast("double").alias("y"),
                     *[F.col(c) for c in tiebreak_cols])
           .where(F.col("x").isNotNull() & F.col("y").isNotNull()))
    order = [F.col("x").asc()] + [F.col(c).asc() for c in tiebreak_cols]
    ranked = global_rank(pts, order, out_col="__r") \
        .select("x", "y", "__r")
    n = ranked.count()
    half = n // 2
    if half == 0:
        raise ValueError("robust_slope: need at least 2 points")
    a = ranked.alias("a")
    b = (ranked.withColumnRenamed("x", "x2")
         .withColumnRenamed("y", "y2")
         .withColumn("__r", F.col("__r") - half).alias("b"))
    slopes = (a.join(b, "__r")
              .where(F.col("x2") != F.col("x"))
              .select(((F.col("y2") - F.col("y"))
                       / (F.col("x2") - F.col("x"))).alias("s")))
    slope = float(slopes.agg(F.median("s")).first()[0])
    inter = float(pts.agg(
        F.median(F.col("y") - F.lit(slope) * F.col("x"))).first()[0])
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n, slopes.count(), round(slope, round_dp),
          round(inter, round_dp))],
        "n bigint, n_pairs bigint, slope double, intercept double")
