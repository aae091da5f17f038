"""Missing-value imputation — the data-cleaning staple the reference
handles ad hoc per plugin (each transformer guards nulls its own way,
e.g. statistical_summary's dropna); this operator centralizes it.

One window pass per strategy (the group statistic and the fill are the
same partitioning, no join), all inside whole-stage codegen.  Global
(ungrouped) imputation uses a single-row aggregate broadcast rather
than a partition-less window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

_STRATS = ("mean", "median", "constant")


@register("impute", PluginType.TRANSFORMER)
def impute(df: DataFrame, value_col: str, strategy: str = "mean",
           group_cols: list[str] | None = None,
           fill_value: float | None = None,
           out_col: str | None = None,
           flag_col: str | None = None) -> DataFrame:
    """Replace nulls in ``value_col`` with the group statistic.

    strategy: 'mean' | 'median' (exact, reference parity) | 'constant'
    (uses ``fill_value``).  ``group_cols=None`` -> global statistic.
    ``flag_col`` optionally records which rows were imputed.  Groups
    that are entirely null stay null (no global fallback — explicit is
    better than a silent mixed strategy).
    """
    if strategy not in _STRATS:
        raise ValueError(f"strategy must be one of {_STRATS}")
    out = out_col or value_col
    if strategy == "constant":
        if fill_value is None:
            raise ValueError("constant strategy needs fill_value")
        stat = F.lit(float(fill_value))
    else:
        agg = F.avg(value_col) if strategy == "mean" \
            else F.median(value_col)
        if group_cols:
            stat = agg.over(Window.partitionBy(*group_cols))
        else:
            # single scalar: one aggregate, joined as a literal via
            # crossJoin of a 1-row frame (broadcast, no window-all)
            row = df.agg(agg.alias("__s")).collect()[0]
            stat = F.lit(row["__s"])
    result = df
    if flag_col:
        # BEFORE the fill: when out_col == value_col the fill overwrites
        # the very column the flag must inspect
        result = result.withColumn(flag_col, F.col(value_col).isNull())
    return result.withColumn(out, F.coalesce(F.col(value_col)
                                             .cast("double"),
                                             stat.cast("double")))


@register("winsorize", PluginType.TRANSFORMER)
def winsorize(df: DataFrame, value_col: str,
              group_cols: list[str] | None = None,
              lower: float = 0.05, upper: float = 0.95,
              out_col: str | None = None) -> DataFrame:
    """Winsorization: clip ``value_col`` to its [lower, upper] EXACT
    percentiles (linear interpolation — Spark ``percentile`` and DuckDB
    ``quantile_cont`` agree), per group or globally.  The standard
    outlier treatment before mean-based statistics.

    Plan: one percentile aggregate per group + a same-key join of the
    two cutoffs back (grouped — AQE broadcasts when the group table is
    small), or a single-row aggregate crossJoin (global) — the data
    never shuffles for the clip itself."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1: {lower}, {upper}")
    out = out_col or f"{value_col}_wins"
    lo = F.percentile(value_col, F.lit(lower)).alias("__lo")
    hi = F.percentile(value_col, F.lit(upper)).alias("__hi")
    if group_cols:
        # no broadcast hint: one row per GROUP scales with the data
        # (think group=user_id), and the join is on the same key the
        # aggregation shuffled on — AQE broadcasts when actually small
        cuts = df.groupBy(*group_cols).agg(lo, hi)
        joined = df.join(cuts, list(group_cols))
    else:
        joined = df.crossJoin(F.broadcast(df.agg(lo, hi)))
    clipped = F.least(F.greatest(F.col(value_col), F.col("__lo")),
                      F.col("__hi"))
    return joined.withColumn(out, clipped).drop("__lo", "__hi")


@register("robust_outliers", PluginType.TRANSFORMER)
def robust_outliers(df: DataFrame, value_col: str,
                    group_cols: list[str] | None = None,
                    threshold: float = 3.5,
                    out_col: str = "is_outlier") -> DataFrame:
    """Robust (median/MAD) outlier flags: |x - median| / (1.4826 · MAD)
    > threshold — the modified z-score (Iglewicz-Hoaglin), immune to
    the outliers polluting the scale estimate the way mean/std z-scores
    are.  MAD = median(|x - median|), both medians EXACT.

    Two aggregation passes per group (median, then MAD needs the median
    first); constant groups (MAD = 0) flag nothing rather than
    everything."""
    groups = list(group_cols or [])
    med = (df.groupBy(*groups).agg(F.median(value_col).alias("__med"))
           if groups else
           df.agg(F.median(value_col).alias("__med")))
    # grouped stat frames carry one row per GROUP (data-scaled): no
    # broadcast hint — same-key joins reuse the aggregation exchange
    # and AQE broadcasts when actually small.  The global single-row
    # aggregates keep the hint.
    with_med = (df.join(med, groups) if groups
                else df.crossJoin(F.broadcast(med)))
    dev = F.abs(F.col(value_col) - F.col("__med"))
    mad = (with_med.groupBy(*groups).agg(F.median(dev).alias("__mad"))
           if groups else
           with_med.agg(F.median(dev).alias("__mad")))
    full = (with_med.join(mad, groups) if groups
            else with_med.crossJoin(F.broadcast(mad)))
    mz = dev / (F.lit(1.4826) * F.col("__mad"))
    flag = F.when(F.col("__mad") == 0, F.lit(False)) \
        .when(F.col(value_col).isNull(), F.lit(None)) \
        .otherwise(mz > F.lit(float(threshold)))
    return full.withColumn(out_col, flag).drop("__med", "__mad")


@register("weighted_median", PluginType.TRANSFORMER)
def weighted_median(df: DataFrame, value_col: str, weight_col: str,
                    group_col: str) -> DataFrame:
    """Exact weighted median per group: the smallest value whose
    cumulative weight reaches half the group total (lower weighted
    median — deterministic, no interpolation, so the result is always
    an observed value and the whole computation replays in SQL).

    One aggregation to (group, value, weight-sum) — ties collapse
    before the window — then a per-group cumulative-weight window over
    DISTINCT values, not rows.  Output: (group, weighted_median,
    total_weight)."""
    from pyspark.sql import Window

    # NULL values can't be medians and NULL weights carry no mass —
    # both would otherwise ride the cumulative window (Spark sorts
    # NULL values FIRST, silently shifting every threshold)
    per_val = (df.where(F.col(value_col).isNotNull()
                        & F.col(weight_col).isNotNull())
               .groupBy(group_col, F.col(value_col).alias("__v"))
               .agg(F.sum(F.col(weight_col).cast("double"))
                    .alias("__w")))
    w_cum = (Window.partitionBy(group_col).orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy(group_col)
    cum = (per_val
           .withColumn("__cw", F.sum("__w").over(w_cum))
           .withColumn("__tw", F.sum("__w").over(w_tot)))
    return (cum.where(F.col("__cw") >= F.col("__tw") / 2)
            .groupBy(group_col)
            .agg(F.min("__v").alias("weighted_median"),
                 F.first("__tw").alias("total_weight")))


@register("quantile_normalize", PluginType.TRANSFORMER)
def quantile_normalize(df: DataFrame, value_col: str,
                       ref: DataFrame, ref_col: str,
                       out_col: str = "qnorm",
                       id_cols: "list[str] | None" = None) -> DataFrame:
    """Quantile normalization: map each value onto the REFERENCE
    distribution by rank — row at quantile q of ``df`` takes the value
    at quantile q of ``ref`` (the batch-effect / domain-shift
    correction from genomics, equally useful for aligning scores from
    two models or two time periods).

    Deterministic recipe: pct = (rank - 0.5)/n over (value, then
    ``id_cols`` — pass a unique key so TIED values map reproducibly;
    without it, tied rows exchange their assigned reference values
    run-to-run, though the assigned multiset is fixed) in the source;
    target index = ceil(pct · n_ref) into the reference order
    statistics.  BOTH ranks come from the shared two-phase distributed
    prefix sum (operators/ranks.py) — no single-partition window on
    either side; the mapping is then one equi-join on the computed
    index.  No interpolation, engine-exact.  NULL source values stay
    NULL (ranking them would map every null onto the reference
    minimum); NULL reference values are ignored.
    Output: original columns + ``out_col``."""
    from niamoto_spark.operators.ranks import global_rank

    ref_nn = (ref.select(F.col(ref_col).alias("__refv"))
              .where(F.col("__refv").isNotNull()))
    n_ref = ref_nn.count()
    src_nn = df.where(F.col(value_col).isNotNull())
    n_src = src_nn.count()
    order = [value_col, *(id_cols or [])]
    ranked = global_rank(src_nn, order, out_col="__rk")
    idx = F.greatest(
        F.lit(1),
        F.ceil((F.col("__rk") - 0.5) / F.lit(float(max(n_src, 1)))
               * F.lit(n_ref)).cast("long"))
    ref_ranked = global_rank(ref_nn, ["__refv"], out_col="__ri")
    mapped = (ranked.withColumn("__ti", idx)
              .join(ref_ranked, F.col("__ti") == F.col("__ri"), "left")
              .withColumnRenamed("__refv", out_col)
              .drop("__rk", "__ti", "__ri"))
    nulls = df.where(F.col(value_col).isNull()).withColumn(
        out_col, F.lit(None).cast(ref.schema[ref_col].dataType))
    return mapped.unionByName(nulls)


@register("golden_record", PluginType.TRANSFORMER)
def golden_record(df: DataFrame, key_col: str, order_col: str,
                  tiebreak_col: str,
                  value_cols: "list[str]") -> DataFrame:
    """Survivorship merge (MDM "golden record"): one row per entity
    where each attribute carries its LATEST NON-NULL value across the
    entity's records — later records override earlier ones
    attribute-by-attribute, but a null never erases a known value
    (the most-recent-wins rule every customer-profile consolidation
    uses).

    One window sort per entity ((order, tiebreak) — deterministic
    under order ties); every attribute resolves in the same WindowExec
    pass via last(ignorenulls) over the full partition frame, then one
    row per key survives.  No self-joins, no per-attribute passes.
    Returns (key, n_records, *value_cols)."""
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(order_col).asc(), F.col(tiebreak_col).asc())
         .rowsBetween(Window.unboundedPreceding,
                      Window.unboundedFollowing))
    picked = df.select(
        F.col(key_col),
        F.count(F.lit(1)).over(
            Window.partitionBy(key_col)).alias("n_records"),
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c)
          for c in value_cols],
        F.row_number().over(
            Window.partitionBy(key_col)
            .orderBy(F.col(order_col).asc(),
                     F.col(tiebreak_col).asc())).alias("__rn"))
    return picked.where(F.col("__rn") == 1).drop("__rn")


@register("trimmed_mean", PluginType.TRANSFORMER)
def trimmed_mean(df: DataFrame, group_cols: "list[str]",
                 value_col: str, trim_frac: float = 0.1,
                 round_dp: int = 4) -> DataFrame:
    """Per-group trimmed mean: average of the values inside the
    [trim, 1−trim] exact-percentile band — the robust center that
    ignores each group's own tails (winsorize clips globally; this
    trims per group).  Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the linear-interpolation definition, so
    the bounds replay exactly.

    Two aggregations on the group key (bounds, then the filtered
    mean), joined back on the same key.  Returns (group…, n_total,
    n_kept, trimmed_mean)."""
    v = F.col(value_col).cast("double")
    bounds = (df.groupBy(*group_cols)
              .agg(F.percentile(v, F.lit(float(trim_frac)))
                   .alias("__lo"),
                   F.percentile(v, F.lit(1.0 - float(trim_frac)))
                   .alias("__hi"),
                   F.count(v).alias("n_total")))
    # no broadcast hint: bounds has one row per group (data-scaled)
    joined = df.join(bounds, group_cols)
    kept = (v >= F.col("__lo")) & (v <= F.col("__hi"))
    return (joined.groupBy(*group_cols)
            .agg(F.max("n_total").alias("n_total"),
                 F.sum(kept.cast("long")).alias("n_kept"),
                 F.round(F.avg(F.when(kept, v)), round_dp)
                 .alias("trimmed_mean")))


@register("debounce_events", PluginType.TRANSFORMER)
def debounce_events(df: DataFrame, key_cols: "list[str]", ts_col: str,
                    tiebreak_col: str, gap_s: int) -> DataFrame:
    """Debounce: collapse bursts of repeated events (same key tuple,
    inter-arrival gap <= ``gap_s``) to their FIRST row, annotated with
    the burst size — double-click suppression, retry-storm collapse,
    sensor chatter removal.  A burst BREAKS when a gap exceeds
    ``gap_s`` (sessionize-per-key semantics: the boundary test is
    against the previous EVENT, so a long slow drizzle stays one
    burst — the debounce contract, distinct from dedup windows keyed
    on absolute time buckets).

    Same single-sort two-window shape as state_periods: lag gap flag +
    running burst id, then one aggregate keeping min-by-order rows.
    Returns the kept rows with ``burst_n`` appended."""
    from pyspark.sql import Window

    wo = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    t = F.col(ts_col).cast("double")
    flagged = df.withColumn(
        "__new",
        F.when(t - F.lag(t).over(wo) <= float(gap_s), 0).otherwise(1))
    bursts = flagged.withColumn(
        "__burst",
        F.sum("__new").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
    wb = Window.partitionBy(*key_cols, "__burst")
    ranked = (bursts
              .withColumn("__rn", F.row_number().over(
                  Window.partitionBy(*key_cols, "__burst")
                  .orderBy(ts_col, tiebreak_col)))
              .withColumn("burst_n", F.count(F.lit(1)).over(wb)))
    return (ranked.where(F.col("__rn") == 1)
            .drop("__new", "__burst", "__rn"))
