"""Experiment analysis (A/B testing) aggregates — the readout layer a
data platform bolts onto its event warehouse.

Closed-form frequentist statistics only (two-proportion pooled z,
difference in means with Welch variance): every number is one
aggregation pass in exact algebra, so the whole readout replays in SQL
(q186's oracle).  P-values are deliberately NOT computed here — erf is
not portable SQL; callers threshold |z| (1.96 ~ p<.05 two-sided).

No reference counterpart (the reference has no experiment tooling);
extension-brief operator for the events lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("ab_proportion_test", PluginType.TRANSFORMER)
def ab_proportion_test(df: DataFrame, variant_col: str,
                       success_col: str,
                       control: str, treatment: str) -> DataFrame:
    """Two-proportion pooled z-test between two variants.

    z = (p_t - p_c) / sqrt(p_pool (1 - p_pool) (1/n_c + 1/n_t))

    One aggregation to two rows, then scalar algebra — the million-user
    experiment reduces to a 1-row readout with no second pass.  Output:
    (n_c, n_t, rate_c, rate_t, lift, z)."""
    agg = (df.where(F.col(variant_col).isin([control, treatment]))
           .groupBy(variant_col)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col(success_col).cast("long")).alias("s")))
    c = F.when(F.col(variant_col) == control, 1).otherwise(0)
    wide = (agg.agg(
        F.sum(F.col("n") * c).alias("n_c"),
        F.sum(F.col("s") * c).alias("s_c"),
        F.sum(F.col("n") * (1 - c)).alias("n_t"),
        F.sum(F.col("s") * (1 - c)).alias("s_t")))
    rate_c = F.col("s_c") / F.col("n_c")
    rate_t = F.col("s_t") / F.col("n_t")
    pool = (F.col("s_c") + F.col("s_t")) / (F.col("n_c") + F.col("n_t"))
    se = F.sqrt(pool * (1 - pool)
                * (1 / F.col("n_c") + 1 / F.col("n_t")))
    return wide.select(
        "n_c", "n_t",
        rate_c.alias("rate_c"), rate_t.alias("rate_t"),
        (rate_t - rate_c).alias("lift"),
        F.when(se > 0, (rate_t - rate_c) / se)
         .otherwise(F.lit(0.0)).alias("z"))


@register("ab_mean_test", PluginType.TRANSFORMER)
def ab_mean_test(df: DataFrame, variant_col: str, value_col: str,
                 control: str, treatment: str) -> DataFrame:
    """Welch z for a continuous metric: (m_t - m_c) /
    sqrt(v_c/n_c + v_t/n_t) with population variances.  Same one-pass
    shape as ab_proportion_test."""
    agg = (df.where(F.col(variant_col).isin([control, treatment]))
           .groupBy(variant_col)
           .agg(F.count(F.lit(1)).alias("n"),
                F.avg(value_col).alias("m"),
                F.var_pop(value_col).alias("v")))
    c = F.when(F.col(variant_col) == control, 1).otherwise(0)
    wide = (agg.agg(
        F.sum(F.col("n") * c).alias("n_c"),
        F.sum(F.col("m") * c).alias("m_c"),
        F.sum(F.col("v") * c).alias("v_c"),
        F.sum(F.col("n") * (1 - c)).alias("n_t"),
        F.sum(F.col("m") * (1 - c)).alias("m_t"),
        F.sum(F.col("v") * (1 - c)).alias("v_t")))
    se = F.sqrt(F.col("v_c") / F.col("n_c")
                + F.col("v_t") / F.col("n_t"))
    return wide.select(
        "n_c", "n_t", F.col("m_c").alias("mean_c"),
        F.col("m_t").alias("mean_t"),
        (F.col("m_t") - F.col("m_c")).alias("diff"),
        F.when(se > 0, (F.col("m_t") - F.col("m_c")) / se)
         .otherwise(F.lit(0.0)).alias("z"))


@register("permutation_test", PluginType.TRANSFORMER)
def permutation_test(df: DataFrame, variant_col: str, value_col: str,
                     id_col: str, treatment: str, n_perms: int = 99,
                     seed: str = "perm", round_dp: int = 6) -> DataFrame:
    """Randomization (permutation) test for a difference in means:
    the observed statistic is mean(treatment) − mean(control); the null
    distribution reassigns every row to a pseudo-arm by a DETERMINISTIC
    md5 coin per (seed, permutation, id) — no RNG state, so any engine
    replays the exact same ``n_perms`` pseudo-experiments and the
    p-value is reproducible bit-for-bit.

        p = (1 + #{ |stat_p| ≥ |stat_obs| }) / (n_perms + 1)

    (the +1 add-one counts the observed labeling itself, the standard
    finite-sample correction that keeps p > 0).

    Distribution: ONE projection explodes each row into ``n_perms``
    (perm, arm, value) triples and partial aggregation collapses them
    map-side to ``n_perms`` groups — the shuffle carries n_perms rows,
    not n_rows × n_perms.  At corpus scale choose n_perms to size the
    expanded scan (P × one column), or pre-sample rows; the test's
    power saturates long before P = 99 on big-N data.
    Returns ONE row: (n_perms, obs_diff, n_ge, p_value).
    Statistics are rounded to ``round_dp`` BEFORE the ≥ comparison so
    the tail count never hinges on a final-ulp difference.
    """
    # NULL unit ids can't be coined (concat_ws would fold them all onto
    # the md5(seed|perm) coin while SQL's || nulls out) — excluded, the
    # md5-coin pin
    two = (df.where(F.col(value_col).isNotNull()
                    & F.col(id_col).isNotNull())
           .select(F.col(variant_col).alias("arm"),
                   F.col(value_col).cast("double").alias("v"),
                   F.col(id_col).cast("string").alias("id")))
    obs_row = (two.groupBy()
               .agg(F.avg(F.when(F.col("arm") == treatment, F.col("v")))
                    .alias("mt"),
                    F.avg(F.when(F.col("arm") != treatment, F.col("v")))
                    .alias("mc"))).first()
    obs = round(float(obs_row["mt"]) - float(obs_row["mc"]), round_dp)

    p = F.explode(F.sequence(F.lit(1), F.lit(n_perms))).alias("p")
    h = F.conv(F.substring(
        F.md5(F.concat_ws("|", F.lit(seed), F.col("p").cast("string"),
                          F.col("id"))), 1, 13), 16, 10).cast("double")
    uni = (h + 0.5) / F.lit(float(16 ** 13))
    expanded = (two.select("id", "v", p)
                .withColumn("g", (uni < 0.5).cast("int")))
    stats = (expanded.groupBy("p")
             .agg((F.avg(F.when(F.col("g") == 1, F.col("v")))
                   - F.avg(F.when(F.col("g") == 0, F.col("v"))))
                  .alias("diff")))
    return (stats
            .agg(F.lit(n_perms).alias("n_perms"),
                 F.lit(obs).alias("obs_diff"),
                 F.sum((F.abs(F.round(F.col("diff"), round_dp))
                        >= F.lit(abs(obs))).cast("int")).alias("n_ge"))
            .withColumn("p_value",
                        F.round((F.col("n_ge") + 1)
                                / F.lit(float(n_perms + 1)), 6)))


@register("uplift_by_segment", PluginType.TRANSFORMER)
def uplift_by_segment(df: DataFrame, variant_col: str, treatment: str,
                      outcome_col: str, segment_col: str,
                      round_dp: int = 6) -> DataFrame:
    """Heterogeneous treatment effect by segment (two-model/T-learner
    difference of observed rates): per segment, the treated and
    control outcome rates and their difference — where an experiment's
    average effect hides opposite-signed subgroups.

    One aggregation on (segment, arm) then a per-segment pivot of the
    two arms — exact integer counts, no model fit, fully
    SQL-replayable.  Returns (segment, n_treat, n_ctrl, rate_treat,
    rate_ctrl, uplift)."""
    y = F.col(outcome_col).cast("double")
    is_t = F.col(variant_col) == treatment
    per = (df.groupBy(F.col(segment_col).alias("segment"))
           .agg(F.sum(is_t.cast("long")).alias("n_treat"),
                F.sum((~is_t).cast("long")).alias("n_ctrl"),
                F.sum(F.when(is_t, y).otherwise(0)).alias("__st"),
                F.sum(F.when(~is_t, y).otherwise(0)).alias("__sc")))
    rt = F.col("__st") / F.col("n_treat")
    rc = F.col("__sc") / F.col("n_ctrl")
    return (per.where((F.col("n_treat") > 0) & (F.col("n_ctrl") > 0))
            .select("segment", "n_treat", "n_ctrl",
                    F.round(rt, round_dp).alias("rate_treat"),
                    F.round(rc, round_dp).alias("rate_ctrl"),
                    F.round(rt - rc, round_dp).alias("uplift")))


@register("poisson_bootstrap", PluginType.TRANSFORMER)
def poisson_bootstrap(df: DataFrame, value_col: str, id_col: str,
                      n_boot: int = 50, seed: str = "boot",
                      lo_q: float = 0.025, hi_q: float = 0.975,
                      round_dp: int = 4) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean — the
    resampling scheme that actually distributes: instead of drawing n
    rows with replacement (which needs global coordination), each row
    enters replicate b with weight w ~ Poisson(1), independent across
    rows and replicates (Chamandy et al.'s "Estimating Uncertainty
    for Massive Data Streams", the standard at-scale bootstrap).

    Weights come from a DETERMINISTIC md5 uniform inverted through the
    Poisson(1) CDF (truncated at 4: P(W>4) = 0.37%, folded into the
    top cell) — so every replicate is reproducible and an external
    engine replays the whole bootstrap.  One explode×n_boot projection
    collapses map-side to n_boot replicate means; the CI is the exact
    order statistic over those (tiny) means.  Returns ONE row:
    (n_rows, n_boot, mean, ci_lo, ci_hi)."""
    from pyspark.sql import Window

    # Poisson(1) CDF: 0.3679, 0.7358, 0.9197, 0.9810, then 1.0
    # (NULL ids excluded — the md5-coin pin, as permutation_test)
    base = (df.where(F.col(value_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(value_col).cast("double").alias("v"),
                    F.col(id_col).cast("string").alias("id")))
    n_rows = base.count()
    mean = round(float(base.agg(F.avg("v")).first()[0]), round_dp)
    b = F.explode(F.sequence(F.lit(1), F.lit(n_boot))).alias("b")
    h = F.conv(F.substring(
        F.md5(F.concat_ws("|", F.lit(seed), F.col("b").cast("string"),
                          F.col("id"))), 1, 13), 16, 10).cast("double")
    uni = (h + 0.5) / F.lit(float(16 ** 13))
    w = (F.when(uni < 0.3679, 0).when(uni < 0.7358, 1)
         .when(uni < 0.9197, 2).when(uni < 0.9810, 3).otherwise(4))
    reps = (base.select("v", "id", b)
            .withColumn("w", w)
            .groupBy("b")
            .agg((F.sum(F.col("w") * F.col("v"))
                  / F.sum("w")).alias("m")))
    k_lo = max(int(lo_q * n_boot), 1)
    k_hi = min(int(hi_q * n_boot) + 1, n_boot)
    wr = Window.orderBy(F.col("m").asc(), F.col("b").asc())
    ranked = reps.withColumn("__r", F.row_number().over(wr))
    return (ranked.agg(
        F.lit(n_rows).alias("n_rows"),
        F.lit(n_boot).alias("n_boot"),
        F.lit(mean).alias("mean"),
        F.round(F.min(F.when(F.col("__r") == k_lo, F.col("m"))),
                round_dp).alias("ci_lo"),
        F.round(F.min(F.when(F.col("__r") == k_hi, F.col("m"))),
                round_dp).alias("ci_hi")))


@register("cuped_adjust", PluginType.TRANSFORMER)
def cuped_adjust(df: DataFrame, variant_col: str, value_col: str,
                 covariate_col: str, treatment: str,
                 round_dp: int = 6) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): adjust the
    experiment metric with a pre-period covariate,
    y' = y − θ(x − mean(x)), θ = cov(x, y)/var(x) — the industry-
    standard way to shrink A/B confidence intervals ~(1 − ρ²)× for
    free.  Reports both the RAW and ADJUSTED arm difference plus the
    variance-reduction ratio, so the win is visible in the output.

    θ and all moments come from ONE aggregate (sum/sum-of-products —
    closed form, no fit loop); the adjustment is a projection.
    Returns a single row: (n_t, n_c, theta, diff_raw, diff_adj,
    var_ratio)."""
    y = F.col(value_col).cast("double")
    x = F.col(covariate_col).cast("double")
    is_t = (F.col(variant_col) == treatment).cast("int")
    m = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"),
        F.sum(is_t).alias("nt"), F.sum(is_t * y).alias("syt"),
        F.sum(is_t * x).alias("sxt"),
        F.sum(y * y).alias("syy")).first()
    n = float(m["n"])
    mx, my = m["sx"] / n, m["sy"] / n
    var_x = m["sxx"] / n - mx * mx
    cov = m["sxy"] / n - mx * my
    theta = cov / var_x if var_x > 0 else 0.0
    nt, nc = float(m["nt"]), n - float(m["nt"])
    my_t = m["syt"] / nt
    my_c = (m["sy"] - m["syt"]) / nc
    mx_t = m["sxt"] / nt
    mx_c = (m["sx"] - m["sxt"]) / nc
    diff_raw = my_t - my_c
    diff_adj = (my_t - theta * (mx_t - mx)) - (my_c - theta * (mx_c - mx))
    var_y = m["syy"] / n - my * my
    rho2 = (cov * cov) / (var_x * var_y) \
        if var_x > 0 and var_y > 0 else 0.0
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(int(nt), int(nc), theta, diff_raw, diff_adj, 1.0 - rho2)],
        "n_t long, n_c long, theta double, diff_raw double, "
        "diff_adj double, var_ratio double")
    return out.select(
        "n_t", "n_c", F.round("theta", round_dp).alias("theta"),
        F.round("diff_raw", round_dp).alias("diff_raw"),
        F.round("diff_adj", round_dp).alias("diff_adj"),
        F.round("var_ratio", round_dp).alias("var_ratio"))


@register("bh_fdr", PluginType.TRANSFORMER)
def bh_fdr(df: DataFrame, test_col: str, p_col: str,
           alpha: float = 0.05, round_dp: int = 6) -> DataFrame:
    """Benjamini–Hochberg FDR control over a battery of hypothesis
    tests: rank p ascending, find the largest k with
    p_(k) <= (k/m)·α, reject tests 1..k — what a segment-sliced
    experiment MUST do before celebrating its smallest p-value
    (at m=20 segments, one p < 0.05 is expected under the null).

    Two windows over the m-row test table (rank, then the suffix-max
    of the pass flags — a test is rejected if ANY later rank passes).
    Returns (test, p_value, rank, threshold, rejected)."""
    from pyspark.sql import Window

    # a test without a p-value is not a test: it can neither rank nor
    # count toward m (Spark's asc would rank NULLs FIRST, stealing the
    # most-significant slots)
    df = df.where(F.col(p_col).isNotNull())
    m = df.count()
    w = Window.orderBy(F.col("p_value").asc(), F.col("test"))
    ranked = (df.select(F.col(test_col).alias("test"),
                        F.col(p_col).cast("double").alias("p_value"))
              .withColumn("rank", F.row_number().over(w))
              .withColumn("threshold",
                          F.round(F.col("rank") / m * alpha, round_dp)))
    passes = (F.col("p_value") <= F.col("rank") / m * alpha).cast("int")
    wmax = (Window.orderBy(F.col("rank").desc())
            .rowsBetween(Window.unboundedPreceding, 0))
    return (ranked.withColumn("rejected",
                              (F.max(passes).over(wmax) == 1))
            .select("test", F.round("p_value", round_dp).alias("p_value"),
                    "rank", "threshold", "rejected"))


@register("diff_in_diff", PluginType.TRANSFORMER)
def diff_in_diff(df: DataFrame, group_col: str, period_col: str,
                 value_col: str, treated: str, post: str,
                 round_dp: int = 6) -> DataFrame:
    """Difference-in-differences: the 2x2 interaction estimate
    (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) — the workhorse
    quasi-experimental estimator when randomization wasn't available
    and parallel trends is the assumption you're willing to sign.

    One (group, period) aggregate -> four cell means -> scalar
    algebra.  Returns the four means, both single differences and the
    DiD estimate."""
    y = F.col(value_col).cast("double")
    g = (F.col(group_col) == treated)
    p = (F.col(period_col) == post)
    cells = df.agg(
        F.avg(F.when(g & p, y)).alias("t_post"),
        F.avg(F.when(g & ~p, y)).alias("t_pre"),
        F.avg(F.when(~g & p, y)).alias("c_post"),
        F.avg(F.when(~g & ~p, y)).alias("c_pre"))
    d_t = F.col("t_post") - F.col("t_pre")
    d_c = F.col("c_post") - F.col("c_pre")
    return cells.select(
        F.round("t_pre", round_dp).alias("t_pre"),
        F.round("t_post", round_dp).alias("t_post"),
        F.round("c_pre", round_dp).alias("c_pre"),
        F.round("c_post", round_dp).alias("c_post"),
        F.round(d_t, round_dp).alias("diff_treated"),
        F.round(d_c, round_dp).alias("diff_control"),
        F.round(d_t - d_c, round_dp).alias("did"))


@register("rdd_estimate", PluginType.TRANSFORMER)
def rdd_estimate(df: DataFrame, running_col: str, value_col: str,
                 cutoff: float, bandwidth: float,
                 round_dp: int = 6) -> DataFrame:
    """Sharp regression discontinuity: local LINEAR fits on each side
    of the cutoff within ``bandwidth``, jump = intercept(right at c)
    − intercept(left at c) — the design that identifies a causal
    effect from a threshold rule (score cutoffs, eligibility lines).

    Each side's slope/intercept comes from the closed-form normal
    equations over centered x = running − cutoff (ONE aggregate per
    side, no fit loop).  Returns per-side n/slope/value-at-cutoff and
    the jump."""
    x = F.col(running_col).cast("double") - float(cutoff)
    y = F.col(value_col).cast("double")
    inb = (F.abs(x) <= float(bandwidth))

    def side(pred, tag):
        return df.where(inb & pred).agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.avg(x).alias(f"mx_{tag}"), F.avg(y).alias(f"my_{tag}"),
            F.avg(x * y).alias(f"mxy_{tag}"),
            F.avg(x * x).alias(f"mxx_{tag}"))

    l = side(x < 0, "l").first()
    r = side(x >= 0, "r").first()

    def fit(m, tag):
        vx = m[f"mxx_{tag}"] - m[f"mx_{tag}"] ** 2
        slope = ((m[f"mxy_{tag}"] - m[f"mx_{tag}"] * m[f"my_{tag}"])
                 / vx) if vx and vx > 0 else 0.0
        at_c = m[f"my_{tag}"] - slope * m[f"mx_{tag}"]  # x=0 intercept
        return int(m[f"n_{tag}"]), float(slope), float(at_c)

    nl, sl, yl = fit(l, "l")
    nr, sr, yr = fit(r, "r")
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(nl, nr, sl, sr, yl, yr, yr - yl)],
        "n_left long, n_right long, slope_left double, "
        "slope_right double, y_left double, y_right double, "
        "jump double")
    return out.select(
        "n_left", "n_right",
        F.round("slope_left", round_dp).alias("slope_left"),
        F.round("slope_right", round_dp).alias("slope_right"),
        F.round("y_left", round_dp).alias("y_left"),
        F.round("y_right", round_dp).alias("y_right"),
        F.round("jump", round_dp).alias("jump"))


@register("wald_iv", PluginType.TRANSFORMER)
def wald_iv(df: DataFrame, instrument_col: str, treatment_col: str,
            value_col: str, round_dp: int = 6) -> DataFrame:
    """Wald instrumental-variable estimator with a binary instrument:
    LATE = (ȳ_{z=1} − ȳ_{z=0}) / (d̄_{z=1} − d̄_{z=0}) — intention-
    to-treat effect scaled by the first-stage compliance difference,
    the one-line answer to non-compliance in encouragement designs.

    One aggregate, scalar algebra.  Returns ITT, first stage and the
    LATE (NULL when the first stage is 0 — a weak-instrument
    situation the caller must see, not a division blow-up)."""
    z = F.col(instrument_col).cast("int")
    d = F.col(treatment_col).cast("double")
    y = F.col(value_col).cast("double")
    m = df.agg(
        F.avg(F.when(z == 1, y)).alias("y1"),
        F.avg(F.when(z == 0, y)).alias("y0"),
        F.avg(F.when(z == 1, d)).alias("d1"),
        F.avg(F.when(z == 0, d)).alias("d0"),
        F.sum(z).alias("n1"),
        F.sum(1 - z).alias("n0"))
    itt = F.col("y1") - F.col("y0")
    fs = F.col("d1") - F.col("d0")
    return m.select(
        F.col("n1").cast("long").alias("n_encouraged"),
        F.col("n0").cast("long").alias("n_control"),
        F.round(itt, round_dp).alias("itt"),
        F.round(fs, round_dp).alias("first_stage"),
        F.round(F.when(F.abs(fs) > 0, itt / fs), round_dp)
        .alias("late"))


@register("ipf_raking", PluginType.TRANSFORMER)
def ipf_raking(df: DataFrame, row_col: str, col_col: str,
               row_targets: "dict", col_targets: "dict",
               iters: int = 3, round_dp: int = 6) -> DataFrame:
    """Survey raking / iterative proportional fitting: reweight a
    sample's (row, col) cells so the weighted marginals match known
    population targets — the post-stratification standard when the
    sample's demographic mix doesn't match the population's.

    ``iters`` alternating scalings (rows to row targets, then columns
    to column targets), each one a tiny join-scale on the CELL table
    (cells, not rows — the aggregate happens once up front), fully
    deterministic, so an oracle replays the identical unrolled
    sequence.  Returns (row, col, n, weight) with weight = the
    raked cell mass per original row."""
    cells = (df.groupBy(F.col(row_col).alias("r"),
                        F.col(col_col).alias("c"))
             .agg(F.count(F.lit(1)).alias("n"))
             .withColumn("w", F.col("n").cast("double")))
    spark = df.sparkSession
    rt = spark.createDataFrame(
        [(k, float(v)) for k, v in row_targets.items()],
        "r string, rt double")
    ct = spark.createDataFrame(
        [(k, float(v)) for k, v in col_targets.items()],
        "c string, ct double")
    for _ in range(int(iters)):
        rsum = cells.groupBy("r").agg(F.sum("w").alias("rs"))
        cells = (cells.join(rsum, "r").join(F.broadcast(rt), "r")
                 .withColumn("w", F.col("w") * F.col("rt")
                             / F.col("rs"))
                 .drop("rs", "rt"))
        csum = cells.groupBy("c").agg(F.sum("w").alias("cs"))
        cells = (cells.join(csum, "c").join(F.broadcast(ct), "c")
                 .withColumn("w", F.col("w") * F.col("ct")
                             / F.col("cs"))
                 .drop("cs", "ct"))
        cells = cells.localCheckpoint(eager=True)
    return cells.select(F.col("r").alias(row_col),
                        F.col("c").alias(col_col), "n",
                        F.round(F.col("w") / F.col("n"), round_dp)
                        .alias("weight"))
