"""Time-series utilities over event streams: gap densification and
cohort retention.

Extends the reference's time_series_analysis transformer (monthly
phenology matrices, core/plugins/transformers/time_series_analysis.py)
with the two event-warehouse staples its fixed month grid cannot
express: arbitrary-granule densification (a series with NO row for an
empty bucket is ambiguous downstream — charts, models and window
functions all need explicit zeros) and cohort/retention matrices.
"""

from __future__ import annotations

import logging
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

log = logging.getLogger(__name__)


@register("fill_time_gaps", PluginType.TRANSFORMER)
def fill_time_gaps(aggregated: DataFrame, key_col: str, bucket_col: str,
                   fill: Mapping[str, float],
                   max_buckets_per_key: int = 100_000) -> DataFrame:
    """Densify a per-(key, bucket) aggregate: emit one row for EVERY
    integer bucket between each key's min and max, with ``fill`` values
    for the gaps.

    Scale: the explode is bounded per key by its own span — dense output
    is the point — but a corrupt key spanning the whole epoch would
    explode alone into billions of rows, so spans over
    ``max_buckets_per_key`` are truncated (logged), the same runaway
    guard as interval_join.  The gap join is an equi-join on
    (key, bucket) — co-partitioned with the aggregate that produced the
    input, so AQE plans it without an extra wide shuffle.
    """
    spans = aggregated.groupBy(key_col).agg(
        F.min(bucket_col).alias("__b0"), F.max(bucket_col).alias("__b1"))
    # materialize the over-cap flag BEFORE rewriting __b1 — the predicate
    # re-evaluated against the capped column can never be true
    flagged = spans.withColumn(
        "__over", F.col("__b1") - F.col("__b0") + 1 > max_buckets_per_key)
    capped = flagged.withColumn(
        "__b1", F.when(F.col("__over"),
                       F.col("__b0") + max_buckets_per_key - 1)
                 .otherwise(F.col("__b1")))
    if capped.where(F.col("__over")).limit(1).count():
        log.warning("fill_time_gaps: key span(s) over %d buckets "
                    "truncated", max_buckets_per_key)
    capped = capped.drop("__over")
    dense = capped.select(
        key_col,
        F.explode(F.sequence("__b0", "__b1")).alias(bucket_col))
    out = dense.join(aggregated, [key_col, bucket_col], "left")
    return out.fillna(dict(fill))


@register("cohort_retention", PluginType.TRANSFORMER)
def cohort_retention(events: DataFrame, user_col: str, ts_col: str,
                     granule_s: int = 86_400) -> DataFrame:
    """(cohort_bucket, bucket_offset, n_users): how many of the users
    first seen in cohort_bucket were active again offset buckets later —
    the retention triangle.

    Two shuffles: the per-user first-bucket aggregate, then the
    (cohort, offset) distinct-count; the join carrying the cohort back
    onto activity rows keys on the user — the same partitioning as the
    first aggregate, so AQE reuses it."""
    bucket = F.floor(F.col(ts_col) / granule_s).cast("long")
    activity = events.select(F.col(user_col).alias("__u"),
                             bucket.alias("__b")).distinct()
    firsts = activity.groupBy("__u").agg(F.min("__b").alias("__cohort"))
    return (activity.join(firsts, "__u")
            .groupBy(F.col("__cohort").alias("cohort_bucket"),
                     (F.col("__b") - F.col("__cohort"))
                     .alias("bucket_offset"))
            .agg(F.count_distinct("__u").alias("n_users")))


@register("transition_matrix", PluginType.TRANSFORMER)
def transition_matrix(events: DataFrame, key_col: str, ts_col: str,
                      state_col: str,
                      order_cols: "tuple[str, ...]" = (),
                      round_dp: int = 4) -> DataFrame:
    """First-order Markov transition estimates over per-key event
    sequences: P(next state | current state) with raw bigram counts —
    the sequential-pattern summary behind next-event prediction and
    anomalous-flow detection.

    One window shuffle (lag over the per-key order — the same
    partitioning SCD2 uses) + one hash aggregate over (from, to); the
    row-probability normalization is a window over the tiny aggregated
    matrix, not the events."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev = F.lag(F.col(state_col)).over(w)
    bigrams = (events.withColumn("__from", prev)
               .where(F.col("__from").isNotNull())
               .groupBy(F.col("__from").alias("from_state"),
                        F.col(state_col).alias("to_state"))
               .agg(F.count(F.lit(1)).alias("n")))
    total = Window.partitionBy("from_state")
    return bigrams.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(total), round_dp))


@register("ewma", PluginType.TRANSFORMER)
def ewma(df: DataFrame, key_col: str, order_col: str, value_col: str,
         alpha: float = 0.3, lookback: int = 40, round_dp: int = 4,
         out_col: str = "ewma") -> DataFrame:
    """Exponentially-weighted moving average per key — the pandas
    ``ewm(adjust=True)`` weighting with an explicit finite ``lookback``:

        s_i = sum_{d=0..L} (1-alpha)^d * x_{i-d}
              / sum_{d=0..L} (1-alpha)^d          (missing lags skipped)

    The naive recurrence s_i = a*x_i + (1-a)*s_{i-1} looks sequential;
    the finite-memory form above is a plain weighted lag-sum, which is
    ONE window sort per key with L+1 lag() expressions evaluated in the
    same WindowExec pass — no UDF, no recursion, no driver loop, and an
    external SQL engine replays it term-for-term (the oracle does).
    With the default alpha=0.3, the truncated tail weight is
    0.7^41 ~ 4e-7 of the total — below 4dp rounding.

    Scale: cost is one shuffle on key_col + an O(L) projection per row;
    L is a constant, so the plan is identical at 100 TB.  Contrast with
    a driver-sequential recurrence, which cannot distribute at all.
    """
    from pyspark.sql import Window

    r = 1.0 - alpha
    w = Window.partitionBy(key_col).orderBy(order_col)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for d in range(lookback + 1):
        x_d = F.lag(value_col, d).over(w) if d else F.col(value_col)
        num = num + F.coalesce(x_d * F.lit(r ** d), F.lit(0.0))
        den = den + F.when(x_d.isNotNull(), F.lit(r ** d)).otherwise(0.0)
    # every value in the lookback window NULL -> den 0 -> the smoothed
    # value is undefined (NULL), not an ANSI divide-by-zero crash
    return df.withColumn(
        out_col, F.when(den > 0, F.round(num / den, round_dp)))


@register("cusum_changepoints", PluginType.TRANSFORMER)
def cusum_changepoints(df: DataFrame, key_col: str, order_col: str,
                       value_col: str, target: float, slack: float,
                       threshold: float,
                       round_dp: int = 4) -> DataFrame:
    """Two-sided CUSUM drift detection per key (Page 1954).

    The textbook form is a clamped recurrence,
    S+_i = max(0, S+_{i-1} + (x_i - target - slack)), which looks
    driver-sequential — but the clamp has a closed form:

        S+_i = P_i - min(0, min_{j<=i} P_j),  P = prefix sum of
        (x - target - slack)

    (proof by induction: max(0, P_{i-1} - m + d_i) = P_i - min(m, P_i)),
    and symmetrically S-_i from the prefix sum of (x - target + slack)
    maxed instead of min'd.  So the whole detector is TWO running
    aggregates over ONE window sort per key — fully distributed, and the
    oracle replays the identical identity in SQL.

    Output: input columns + cusum_pos, cusum_neg (rounded) + ``alarm``
    (true when either side exceeds ``threshold``).
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    # two selects because window functions can't nest; both use the same
    # (partition, order), so the physical plan sorts ONCE and chains the
    # two WindowExec operators without a second exchange
    staged = df.withColumn(
        "__p_pos", F.sum(F.col(value_col) - F.lit(target + slack)).over(w)
    ).withColumn(
        "__p_neg", F.sum(F.col(value_col) - F.lit(target - slack)).over(w))
    s_pos = (F.col("__p_pos") -
             F.least(F.lit(0.0), F.min("__p_pos").over(w)))
    s_neg = (F.greatest(F.lit(0.0), F.max("__p_neg").over(w)) -
             F.col("__p_neg"))
    out = (staged.withColumn("cusum_pos", F.round(s_pos, round_dp))
                 .withColumn("cusum_neg", F.round(s_neg, round_dp))
                 .drop("__p_pos", "__p_neg"))
    return out.withColumn(
        "alarm", (F.col("cusum_pos") > threshold) |
                 (F.col("cusum_neg") > threshold))


@register("touch_attribution", PluginType.TRANSFORMER)
def touch_attribution(events: DataFrame, user_col: str, order_col: str,
                      channel_col: str, is_conversion,
                      none_label: str = "(direct)") -> DataFrame:
    """First-touch and last-touch conversion attribution.

    For every conversion event, find the FIRST and the LAST preceding
    non-conversion touch of the same user (strictly earlier in
    ``order_col``, which must be a total order — pass a unique event id
    or a (ts, id) composite).  Conversions with no preceding touch are
    attributed to ``none_label``.

    Pure window expressions: first()/last() with ignorenulls over
    [unbounded, -1] frames — ONE sort per user partition, no self-join,
    no driver state; identical plan shape at any scale.  Returns one row
    per channel: (channel, n_first_touch, n_last_touch).
    """
    from pyspark.sql import Window

    touch_ch = F.when(~is_conversion, F.col(channel_col))
    w = (Window.partitionBy(user_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    tagged = (events
              .withColumn("__first", F.first(touch_ch, ignorenulls=True)
                          .over(w))
              .withColumn("__last", F.last(touch_ch, ignorenulls=True)
                          .over(w))
              .where(is_conversion))
    first_counts = (tagged.groupBy(
        F.coalesce("__first", F.lit(none_label)).alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_first_touch")))
    last_counts = (tagged.groupBy(
        F.coalesce("__last", F.lit(none_label)).alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_last_touch")))
    return (first_counts.join(last_counts, "channel", "full_outer")
            .select("channel",
                    F.coalesce("n_first_touch", F.lit(0))
                     .alias("n_first_touch"),
                    F.coalesce("n_last_touch", F.lit(0))
                     .alias("n_last_touch")))


@register("kaplan_meier", PluginType.TRANSFORMER)
def kaplan_meier(df: DataFrame, duration_col: str, event_col: str,
                 group_col: str | None = None) -> DataFrame:
    """Kaplan-Meier survival curve: for each observed event time t,
    the product-limit estimate S(t) = Π_{t_i <= t} (1 - d_i / n_i)
    with d_i events at t_i and n_i subjects still at risk
    (duration >= t_i).  ``event_col`` is 1 for an observed event, 0
    for right-censored.

    Distribution: ONE aggregation to (group, t, d, total), then two
    window passes over the per-group time axis — n_at_risk is the
    reverse cumulative count (no self-join against the raw rows), and
    the running product is exp(Σ ln(1 - d/n)) so it stays a plain
    cumulative-sum window.  State per group = distinct durations, not
    subjects, so a 100 TB cohort with day-granularity durations
    windows over a few thousand rows per group.  A time where every
    remaining subject dies makes the survival 0 from there on — handled
    with an explicit zero flag, not ln(0).
    """
    from pyspark.sql import Window

    gcols = [group_col] if group_col else []
    grouped = (df.groupBy(*gcols, F.col(duration_col).alias("t"))
               .agg(F.sum(F.col(event_col).cast("long")).alias("d"),
                    F.count(F.lit(1)).alias("total")))
    w_rev = (Window.partitionBy(*gcols).orderBy(F.col("t").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    at_risk = grouped.withColumn("n_at_risk", F.sum("total").over(w_rev))
    ev = at_risk.where(F.col("d") > 0)
    w_fwd = (Window.partitionBy(*gcols).orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ln_term = F.when(F.col("d") < F.col("n_at_risk"),
                     F.log(F.lit(1.0) - F.col("d") / F.col("n_at_risk")))
    died_out = F.max((F.col("d") == F.col("n_at_risk")).cast("int")) \
        .over(w_fwd)
    survival = F.when(died_out == 1, F.lit(0.0)) \
        .otherwise(F.exp(F.sum(ln_term).over(w_fwd)))
    return ev.select(*gcols, "t", "n_at_risk", "d",
                     survival.alias("survival"))


@register("locf_fill", PluginType.TRANSFORMER)
def locf_fill(df: DataFrame, key_col: str, order_col: str,
              value_cols: list[str], backward: bool = False
              ) -> DataFrame:
    """Last-observation-carried-forward gap filling per key: nulls in
    ``value_cols`` take the most recent non-null value under
    ``order_col`` order (optionally next-observation-carried-backward
    for the leading-null head).  One per-key window sort serves every
    column — the panel-data imputation step between sparse sensor /
    price observations and models that need dense series.
    """
    from pyspark.sql import Window

    w_f = (Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_b = (Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
           .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    out = df
    for c in value_cols:
        filled = F.last(c, ignorenulls=True).over(w_f)
        if backward:
            filled = F.coalesce(
                filled, F.first(c, ignorenulls=True).over(w_b))
        out = out.withColumn(c, filled)
    return out


@register("seasonal_residuals", PluginType.TRANSFORMER)
def seasonal_residuals(df: DataFrame, season_col: str, value_col: str,
                       z_threshold: float = 3.0) -> DataFrame:
    """Seasonal-baseline anomaly detection: each observation is scored
    against the mean/stddev of ITS season bucket (hour-of-day,
    day-of-week...) — the cheap STL stand-in that catches "this Monday
    3am is wild for a Monday 3am" where a global z-score sees nothing.

    Two passes expressed as one aggregation + one broadcast join: the
    per-season profile is |seasons| rows (24, 7, 168...), always
    broadcastable; residuals and flags are then a pure projection over
    the original rows.  Population stddev (stddev_pop) so the oracle
    algebra is exact."""
    prof = (df.groupBy(F.col(season_col).alias("__s"))
            .agg(F.avg(value_col).alias("__mu"),
                 F.stddev_pop(value_col).alias("__sigma")))
    joined = df.join(F.broadcast(prof),
                     df[season_col] == F.col("__s"), "left")
    z = F.when(F.col("__sigma") > 0,
               (F.col(value_col) - F.col("__mu")) / F.col("__sigma")) \
        .otherwise(F.lit(0.0))
    return (joined.drop("__s")
            .withColumn("seasonal_z", z)
            .withColumn("is_anomaly",
                        F.abs(F.col("seasonal_z"))
                        > F.lit(float(z_threshold)))
            .withColumnRenamed("__mu", "season_mean")
            .withColumnRenamed("__sigma", "season_std"))


@register("position_attribution", PluginType.TRANSFORMER)
def position_attribution(events: DataFrame, user_col: str,
                         order_col: str, channel_col: str,
                         conversion_expr, round_dp: int = 6
                         ) -> DataFrame:
    """Position-based (U-shaped) conversion attribution: for each
    converting user, the first touch gets 0.4 credit, the last touch
    0.4, and the middle touches split 0.2 evenly (n=1 -> 1.0,
    n=2 -> 0.5/0.5) — the marketing-standard compromise between
    first-touch and last-touch (both of which touch_attribution
    already reports).

    Touches are the non-conversion events strictly before the user's
    FIRST conversion.  Two window passes per user (conversion cutoff,
    touch ranks) + one credit aggregation per channel — no self-join.
    Output: (channel, n_touches, credit)."""
    from pyspark.sql import Window

    w_all = Window.partitionBy(user_col)
    first_conv = F.min(F.when(conversion_expr, F.col(order_col))) \
        .over(w_all)
    touches = (events
               .withColumn("__fc", first_conv)
               .where(F.col("__fc").isNotNull()
                      & (F.col(order_col) < F.col("__fc"))
                      & ~conversion_expr))
    w_u = Window.partitionBy(user_col).orderBy(order_col)
    w_n = Window.partitionBy(user_col)
    ranked = (touches
              .withColumn("__rk", F.row_number().over(w_u))
              .withColumn("__n", F.count(F.lit(1)).over(w_n)))
    n = F.col("__n")
    credit = (
        F.when(n == 1, F.lit(1.0))
        .when((n == 2), F.lit(0.5))
        .when(F.col("__rk") == 1, F.lit(0.4))
        .when(F.col("__rk") == n, F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2)))
    return (ranked.groupBy(F.col(channel_col).alias("channel"))
            .agg(F.count(F.lit(1)).alias("n_touches"),
                 F.round(F.sum(credit), round_dp).alias("credit")))


@register("next_event_baseline", PluginType.TRANSFORMER)
def next_event_baseline(events: DataFrame, key_col: str,
                        order_col: str, state_col: str,
                        round_dp: int = 6) -> DataFrame:
    """Majority-successor baseline from the empirical transition
    counts: for each current state, the most frequent next state, its
    conditional probability, and the accuracy this baseline achieves
    on the data itself — the sanity floor every sequence model must
    beat.

    One per-key lead() window + one (state, next) aggregation + an
    argmax over the (|states|²-row) transition table.  Output:
    (state, predicted_next, p_next, n_transitions)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    trans = (events
             .withColumn("__next", F.lead(state_col).over(w))
             .where(F.col("__next").isNotNull())
             .groupBy(F.col(state_col).alias("state"), "__next")
             .agg(F.count(F.lit(1)).alias("c")))
    w_tot = Window.partitionBy("state")
    w_rank = Window.partitionBy("state").orderBy(
        F.col("c").desc(), F.col("__next").asc())
    return (trans
            .withColumn("__tot", F.sum("c").over(w_tot))
            .withColumn("__rk", F.row_number().over(w_rank))
            .where(F.col("__rk") == 1)
            .select("state", F.col("__next").alias("predicted_next"),
                    F.round(F.col("c") / F.col("__tot"), round_dp)
                    .alias("p_next"),
                    F.col("__tot").alias("n_transitions")))


@register("cohort_ltv", PluginType.TRANSFORMER)
def cohort_ltv(orders: DataFrame, customer_col: str, month_expr,
               amount_col: str, max_age: int = 24) -> DataFrame:
    """Cohort lifetime-value accumulation: customers grouped by first-
    purchase month, revenue accumulated by cohort age — the LTV curve
    ("by month 6 the 2024-01 cohort has spent $X per customer").

    One min-aggregation for cohort assignment, one (cohort, age)
    aggregation, one cumulative window over the (months²-row) cohort
    table.  Output: (cohort_month, age_months, cohort_size, revenue,
    cum_revenue_per_customer)."""
    from pyspark.sql import Window

    base = orders.select(F.col(customer_col).alias("cust"),
                         month_expr.alias("__m"),
                         F.col(amount_col).alias("__amt"))
    firsts = base.groupBy("cust").agg(F.min("__m").alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(
        F.countDistinct("cust").alias("cohort_size"))
    # no broadcast hint on firsts: it is CUSTOMER-cardinality (scales
    # with the data, OOMs a 100 TB broadcast); the join keys on cust —
    # the same partitioning the groupBy produced — so AQE plans it
    # without an extra wide shuffle and still broadcasts when the
    # cohort table is actually small.  sizes (cohort-month cardinality)
    # stays an explicit broadcast below.
    j = base.join(firsts, "cust")
    per_age = (j.withColumn("age", (F.col("__m") - F.col("cohort"))
                            .cast("int"))
               .where(F.col("age") <= max_age)
               .groupBy("cohort", "age")
               # decimal(18,2) sums: revenue is exact, so the curve is
               # bit-identical across engines and summation orders
               .agg(F.sum(F.col("__amt").cast("decimal(18,2)"))
                    .cast("decimal(38,2)").alias("revenue")))
    w = (Window.partitionBy("cohort").orderBy("age")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (per_age.join(F.broadcast(sizes), "cohort")
            .select(F.col("cohort").alias("cohort_month"),
                    F.col("age").alias("age_months"),
                    "cohort_size", "revenue",
                    # integer-cent arithmetic to the end: half-up on
                    # the exact cents, then one /100.0 — engines round
                    # an exact .xx5 quotient differently through both
                    # binary doubles AND their decimal-division scale
                    # rules, so neither is a safe meeting point
                    (F.floor((F.sum("revenue").over(w)
                              .cast("decimal(38,2)") * 200
                              + F.col("cohort_size"))
                             / (F.col("cohort_size") * 2))
                     .cast("bigint") / F.lit(100.0))
                    .alias("cum_revenue_per_customer")))


@register("stl_decompose", PluginType.TRANSFORMER)
def stl_decompose(df: DataFrame, key_col: str, order_col: str,
                  value_col: str, period: int,
                  trend_window: int = 3,
                  round_dp: int = 4) -> DataFrame:
    """Additive seasonal-trend decomposition (the moving-average
    classical decomposition — STL's shape without loess):

        trend_i    = centered moving average (±trend_window rows)
        seasonal_p = mean(value − trend) per season phase (i mod
                     period), centered to sum ≈ 0 per key
        residual_i = value − trend − seasonal

    the anomaly-detection prep step: a spike is judged against
    trend+seasonal, not the raw series.  Deterministic (window
    averages, no fitting loop) and exactly SQL-replayable.

    Distribution: every window/aggregate is partitioned by the series
    key — thousands of series decompose in parallel with one shuffle
    on the key; no global window, no driver state.  Edge rows use the
    partial window (standard MA convention).
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(-trend_window, trend_window))
    trend = F.avg(F.col(value_col)).over(w)
    phase = F.pmod(F.col(order_col), F.lit(period))
    base = (df.withColumn("__trend", trend)
            .withColumn("__phase", phase)
            .withColumn("__det", F.col(value_col) - F.col("__trend")))
    ws = Window.partitionBy(key_col, "__phase")
    wk = Window.partitionBy(key_col)
    seas_raw = F.avg("__det").over(ws)
    base = base.withColumn("__sraw", seas_raw)
    seas = F.col("__sraw") - F.avg("__sraw").over(wk)
    return (base.withColumn("seasonal", F.round(seas, round_dp))
            .withColumn("trend", F.round(F.col("__trend"), round_dp))
            .withColumn("residual",
                        F.round(F.col(value_col) - F.col("__trend")
                                - seas, round_dp))
            .drop("__trend", "__det", "__phase", "__sraw"))


@register("decayed_trending", PluginType.TRANSFORMER)
def decayed_trending(df: DataFrame, key_col: str, ts_col: str,
                     half_life_s: float, ref_ts: float,
                     top_k: int = 10, weight_col: str | None = None,
                     round_dp: int = 6) -> DataFrame:
    """Exponentially time-decayed popularity ("trending now"): each
    event contributes ``w · 2^(−age/half_life)`` to its key's score,
    so yesterday's viral item decays under today's steady riser — the
    recency-weighted leaderboard behind trending feeds, as one
    aggregation (the decay is a row-local expression; no window, no
    state).  ``ref_ts`` is pinned by the caller, not now(), so the
    score is reproducible.

    Deterministic top-k (score desc, key asc): sort-limit
    (TakeOrderedAndProject — no whole-key-table window) with the rank
    assigned over the k survivors.  Returns (rank, key, n_events,
    score)."""
    from pyspark.sql import Window

    age = F.lit(float(ref_ts)) - F.col(ts_col).cast("double")
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    decay = w * F.pow(F.lit(2.0), -age / F.lit(float(half_life_s)))
    scored = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum(decay), round_dp).alias("score")))
    rk = Window.orderBy(F.col("score").desc(), F.col("key").asc())
    return (scored.orderBy(F.col("score").desc(), F.col("key").asc())
            .limit(top_k)
            .withColumn("rank", F.row_number().over(rk))
            .select("rank", "key", "n_events", "score"))


@register("interval_allocate", PluginType.TRANSFORMER)
def interval_allocate(df: DataFrame, start_col: str, end_col: str,
                      value_col: str, granule_s: int,
                      max_buckets_per_row: int = 100_000,
                      round_dp: int = 6) -> DataFrame:
    """Proportional allocation of an interval-scoped quantity onto a
    time grid: a value attached to [start, end) is split across the
    granule buckets it overlaps, weighted by overlap seconds — the
    billing/occupancy primitive ("spread this subscription's revenue
    over the days it covers").  Bucket overlaps are exact integer
    arithmetic; Σ allocated == value by construction.

    One projection + one bounded explode per row (bucket span); rows
    spanning more than ``max_buckets_per_row`` buckets are truncated
    with a warning (the fill_time_gaps runaway guard).  No shuffle at
    all until the caller aggregates the allocated rows.
    Emits (input columns…, bucket, overlap_s, allocated)."""
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    g = int(granule_s)
    b0 = F.floor(s / g).cast("long")
    b1 = F.floor((e - 1) / g).cast("long")
    over = b1 - b0 + 1 > max_buckets_per_row
    n_over = df.where(over).limit(1).count()
    if n_over:
        log.warning("interval_allocate: row span(s) over %d buckets "
                    "truncated", max_buckets_per_row)
    b1c = F.when(over, b0 + max_buckets_per_row - 1).otherwise(b1)
    base = (df.where(e > s)
            .withColumn("bucket",
                        F.explode(F.sequence(b0, b1c))))
    ov = (F.least(e, (F.col("bucket") + 1) * g)
          - F.greatest(s, F.col("bucket") * g))
    return (base.withColumn("overlap_s", ov)
            .withColumn("allocated",
                        F.round(F.col(value_col) * ov.cast("double")
                                / (e - s).cast("double"), round_dp)))


@register("cumulative_unique", PluginType.TRANSFORMER)
def cumulative_unique(df: DataFrame, entity_col: str, ts_col: str,
                      granule_s: int = 86_400) -> DataFrame:
    """Cumulative distinct entities over time ("total users ever seen
    by day") — the growth curve.  COUNT(DISTINCT) OVER a cumulative
    frame is quadratic and unsupported; the exact identity is:
    an entity contributes to the cumulative count from its FIRST
    bucket onward, so

        new_b  = #{entities whose min(bucket) = b}
        cum_b  = Σ_{b' ≤ b} new_b'

    One per-entity min aggregation (entity-keyed shuffle) + one
    cumulative window over the tiny bucket table.  Buckets with no
    new entities still appear (densified via sequence) so the curve
    is plottable as-is.  Returns (bucket, new_entities,
    cum_entities)."""
    from pyspark.sql import Window

    bucket = F.floor(F.col(ts_col) / granule_s).cast("long")
    firsts = (df.select(F.col(entity_col).alias("__e"),
                        bucket.alias("__b"))
              .groupBy("__e").agg(F.min("__b").alias("__fb")))
    news = (firsts.groupBy(F.col("__fb").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("new_entities")))
    span = news.agg(F.min("bucket").alias("b0"),
                    F.max("bucket").alias("b1"))
    dense = span.select(F.explode(F.sequence("b0", "b1"))
                        .alias("bucket"))
    filled = (dense.join(news, "bucket", "left")
              .fillna({"new_entities": 0}))
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    return filled.withColumn("cum_entities",
                             F.sum("new_entities").over(w))


@register("autocorrelation", PluginType.TRANSFORMER)
def autocorrelation(df: DataFrame, key_col: str, order_col: str,
                    value_col: str, max_lag: int = 3,
                    round_dp: int = 4) -> DataFrame:
    """Per-series autocorrelation function (ACF): Pearson correlation
    between the series and its lag-ℓ shift for ℓ = 1..max_lag — the
    periodicity detector (a weekly cycle shows as a spike at lag 7 on
    daily buckets).  Computed as ``corr`` over the aligned (x_t,
    x_{t−ℓ}) pairs, the sample-ACF convention that SQL replays
    verbatim.

    One window sort per key materializes ALL lag columns in the same
    WindowExec pass; one aggregation per key yields every lag's
    correlation.  Returns (key, lag, acf, n_pairs)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    lagged = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("double").alias("v"),
        *[F.lag(F.col(value_col).cast("double"), k).over(w)
          .alias(f"__l{k}") for k in range(1, max_lag + 1)])
    aggs = []
    for k in range(1, max_lag + 1):
        aggs.append(F.round(F.corr("v", f"__l{k}"), round_dp)
                    .alias(f"__a{k}"))
        aggs.append(F.count(f"__l{k}").alias(f"__n{k}"))
    per = lagged.groupBy("key").agg(*aggs)
    out = None
    for k in range(1, max_lag + 1):
        piece = per.select("key", F.lit(k).alias("lag"),
                           F.col(f"__a{k}").alias("acf"),
                           F.col(f"__n{k}").alias("n_pairs"))
        out = piece if out is None else out.unionByName(piece)
    return out


@register("growth_accounting", PluginType.TRANSFORMER)
def growth_accounting(df: DataFrame, entity_col: str, ts_col: str,
                      granule_s: int = 86_400) -> DataFrame:
    """Growth accounting: per period, active users decomposed into
    NEW (first period ever), RETAINED (also active previous period),
    and RESURRECTED (seen before, but not last period), plus CHURNED
    (active previous period, gone now) — the four numbers every
    growth review reads, with active = new + retained + resurrected
    holding exactly.

    One distinct-activity aggregate (entity-keyed), the first-seen
    min, a self-join on (entity, period−1) — co-partitioned with the
    activity aggregate — and one period rollup."""
    # growth is over identified, timestamped activity: a NULL entity
    # or NULL ts would form phantom (NULL, bucket) members that the
    # first-seen join can never pair
    df = df.where(F.col(entity_col).isNotNull()
                  & F.col(ts_col).isNotNull())
    bucket = F.floor(F.col(ts_col) / granule_s).cast("long")
    act = (df.select(F.col(entity_col).alias("u"),
                     bucket.alias("b")).distinct())
    firsts = act.groupBy("u").agg(F.min("b").alias("fb"))
    prev = act.select("u", (F.col("b") + 1).alias("b"),
                      F.lit(1).alias("__prev"))
    cur = (act.join(firsts, "u")
           .join(prev, ["u", "b"], "left"))
    per = (cur.groupBy("b")
           .agg(F.count(F.lit(1)).alias("active"),
                F.sum((F.col("fb") == F.col("b")).cast("long"))
                .alias("new_users"),
                F.sum(((F.col("fb") < F.col("b"))
                       & F.col("__prev").isNotNull()).cast("long"))
                .alias("retained"),
                F.sum(((F.col("fb") < F.col("b"))
                       & F.col("__prev").isNull()).cast("long"))
                .alias("resurrected")))
    churn_src = (act.select("u", (F.col("b") + 1).alias("b"))
                 .join(act.withColumn("__here", F.lit(1)),
                       ["u", "b"], "left")
                 .groupBy("b")
                 .agg(F.sum(F.col("__here").isNull().cast("long"))
                      .alias("churned")))
    return (per.join(churn_src, "b", "left")
            .select(F.col("b").alias("period"), "active", "new_users",
                    "retained", "resurrected",
                    F.coalesce("churned", F.lit(0)).alias("churned")))


@register("time_weighted_avg", PluginType.TRANSFORMER)
def time_weighted_avg(df: DataFrame, key_col: str, ts_col: str,
                      value_col: str, tiebreak_col: str,
                      round_dp: int = 4) -> DataFrame:
    """Time-weighted average over irregular samples (the TimescaleDB
    ``time_weight('Linear')`` shape): per key, the trapezoid integral
    of the value curve divided by the observed span —

        twa = Σ (v_i + v_{i+1})/2 · (t_{i+1} − t_i)  /  (t_n − t_0)

    A plain avg() over-weights bursts of samples; TWA is the honest
    mean of a sensor/price/queue-depth series sampled on change.

    One window pass (lag over (ts, tiebreak) — the tiebreak makes the
    order total so results are partition-invariant), one aggregate.
    Keys with a single sample or zero span fall back to the plain
    average.  Returns (key, n_samples, twa)."""
    from pyspark.sql import Window

    t = F.col(ts_col).cast("double")
    seg = (df.select(F.col(key_col).alias("key"), t.alias("t"),
                     F.col(value_col).cast("double").alias("v"),
                     F.col(tiebreak_col).alias("tb"))
           .withColumn("t_prev", F.lag("t").over(
               Window.partitionBy("key").orderBy("t", "tb")))
           .withColumn("v_prev", F.lag("v").over(
               Window.partitionBy("key").orderBy("t", "tb"))))
    agg = (seg.groupBy("key")
           .agg(F.count(F.lit(1)).alias("n_samples"),
                F.sum(F.when(F.col("t_prev").isNotNull(),
                             (F.col("v") + F.col("v_prev")) / 2
                             * (F.col("t") - F.col("t_prev"))))
                .alias("area"),
                (F.max("t") - F.min("t")).alias("span"),
                F.avg("v").alias("plain_avg")))
    return agg.select(
        F.col("key").alias(key_col), "n_samples",
        F.round(F.when(F.col("span") > 0, F.col("area") / F.col("span"))
                 .otherwise(F.col("plain_avg")), round_dp).alias("twa"))


@register("ohlc_bars", PluginType.TRANSFORMER)
def ohlc_bars(df: DataFrame, key_col: str, ts_col: str, value_col: str,
              tiebreak_col: str, granule_s: int = 3600,
              round_dp: int = 4) -> DataFrame:
    """OHLC candlestick bars: per (key, time bucket) the Open (first
    value), High, Low, Close (last value) and count — the downsampling
    every monitoring/market dashboard runs.

    First/last are ``min_by``/``max_by`` on a composite STRUCT
    (epoch-seconds, tiebreak) order key — Spark orders structs
    lexicographically, so same-timestamp rows break ties on the full
    tiebreak value (no modulo collisions, negative ids fine) — and the
    bar is ONE map-side-combinable aggregation: no window sort, no
    shuffle beyond the groupBy, and ties are deterministic.  Returns
    (key, bucket, open, high, low, close, n)."""
    tsec = F.col(ts_col).cast("double")
    ord_key = F.struct(tsec.alias("t"),
                       F.col(tiebreak_col).cast("double").alias("tb"))
    v = F.col(value_col).cast("double")
    # pinned: bars cover rows with a timestamp, a price, and a usable
    # tiebreak — NULL in any of the three breaks either the bucket,
    # the OHLC values (min_by returns NULL prices), or the
    # deterministic open/close pick (SQL arg_min skips NULL keys)
    df = df.where(F.col(ts_col).isNotNull()
                  & F.col(value_col).isNotNull()
                  & F.col(tiebreak_col).isNotNull())
    return (df.select(F.col(key_col).alias("key"),
                      F.floor(tsec / granule_s).cast("long")
                      .alias("bucket"),
                      v.alias("v"), ord_key.alias("ok"))
            .groupBy("key", "bucket")
            .agg(F.round(F.min_by("v", "ok"), round_dp).alias("open"),
                 F.round(F.max("v"), round_dp).alias("high"),
                 F.round(F.min("v"), round_dp).alias("low"),
                 F.round(F.max_by("v", "ok"), round_dp).alias("close"),
                 F.count(F.lit(1)).alias("n"))
            .withColumnRenamed("key", key_col))


@register("rolling_median", PluginType.TRANSFORMER)
def rolling_median(df: DataFrame, key_col: str, order_col: str,
                   value_col: str, tiebreak_col: str,
                   window: int = 5) -> DataFrame:
    """Exact sliding-window median (ROWS BETWEEN window−1 PRECEDING AND
    CURRENT ROW): the robust smoother a spiky series needs where a
    rolling mean chases outliers.

    Spark has no median window function; the frame here is a small
    CONSTANT k, so collect_list over the row frame + sort_array +
    middle element is exact with a bounded k-element payload per row —
    this stays cheap at any table size because the cost is O(k log k)
    per row, never O(rows) per key.  Ramp-up rows use their shorter
    prefix frame (DuckDB window-aggregate semantics).  Even-length
    frames average the two middle values (median = interpolated
    quantile 0.5).  Appends ``roll_median``."""
    from pyspark.sql import Window

    w = (Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
         .rowsBetween(-(window - 1), 0))
    arr = F.sort_array(F.collect_list(F.col(value_col).cast("double"))
                       .over(w))
    n = F.size(arr)
    # collect_list drops NULLs: an all-NULL frame is EMPTY (n = 0) and
    # its median is NULL, not an index-0 ANSI crash
    lo = F.try_element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.try_element_at(arr, (n / 2 + 1).cast("int"))
    return df.withColumn("roll_median",
                         F.when(n > 0, (lo + hi) / 2))


@register("state_periods", PluginType.TRANSFORMER)
def state_periods(df: DataFrame, key_col: str, order_col: str,
                  state_col: str, tiebreak_col: str) -> DataFrame:
    """Gaps-and-islands: collapse consecutive same-state rows (per key,
    under a total order) into periods — the classic compression of an
    event stream into an SCD-style state timeline (sensor states,
    user status, machine phases).

    The textbook two-window identity: a lag() change flag, then a
    running sum of flags numbers the islands — both windows share ONE
    partitioning/order, so Spark plans a single sort, no extra
    shuffle.  Returns one row per period: (key, state, period_no,
    start, end, run_length)."""
    from pyspark.sql import Window

    wo = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    flagged = df.withColumn(
        "__chg",
        F.when(F.lag(state_col).over(wo).eqNullSafe(F.col(state_col)),
               0).otherwise(1))
    islands = flagged.withColumn(
        "__island",
        F.sum("__chg").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
    return (islands.groupBy(key_col, state_col,
                            F.col("__island").alias("period_no"))
            .agg(F.min(order_col).alias("start"),
                 F.max(order_col).alias("end"),
                 F.count(F.lit(1)).alias("run_length")))


@register("holt_linear", PluginType.TRANSFORMER)
def holt_linear(df: DataFrame, key_col: str, order_col: str,
                value_col: str, alpha: float = 0.5, beta: float = 0.3,
                horizon: int = 3) -> DataFrame:
    """Holt's linear (double exponential) smoothing per series, plus an
    h-step-ahead forecast — trend-aware baseline forecasting, one
    recurrence the closed-form prefix-sum tricks (ewma, cusum) cannot
    express because level and trend update JOINTLY:

        l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1},   l_0=y_0, b_0=y_1−y_0

    Distribution: applyInPandas per key — each series' recurrence runs
    sequentially IN one task (it must), but thousands of series run in
    parallel across executors; the shuffle is one hash exchange on the
    key.  Series need ≥ 2 points (others are dropped).  Returns
    (key, n, level, trend, forecast) with forecast = level +
    horizon·trend.  Values are raw float64 — callers round SQL-side
    (F.round) so cross-engine comparisons never hit Python's
    banker's-rounding on a .5 boundary (the boosted_stumps lesson)."""
    import pandas as pd

    a, b_, h = float(alpha), float(beta), int(horizon)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ord", kind="mergesort")
        y = pdf["__val"].astype("float64").to_numpy()
        if len(y) < 2:
            return pd.DataFrame(
                columns=["__key", "n", "level", "trend", "forecast"])
        lvl, trd = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            prev = lvl
            lvl = a * y[t] + (1 - a) * (lvl + trd)
            trd = b_ * (lvl - prev) + (1 - b_) * trd
        return pd.DataFrame({
            "__key": [pdf["__key"].iloc[0]], "n": [len(y)],
            "level": [float(lvl)], "trend": [float(trd)],
            "forecast": [float(lvl + h * trd)]})

    slim = df.select(F.col(key_col).alias("__key"),
                     F.col(order_col).alias("__ord"),
                     F.col(value_col).cast("double").alias("__val"))
    out = slim.groupBy("__key").applyInPandas(
        fit, schema=f"__key {dict(slim.dtypes)['__key']}, n long, "
                    "level double, trend double, forecast double")
    return out.withColumnRenamed("__key", key_col)


@register("counter_rate", PluginType.TRANSFORMER)
def counter_rate(df: DataFrame, key_col: str, ts_col: str,
                 value_col: str, tiebreak_col: str,
                 round_dp: int = 4) -> DataFrame:
    """Monotonic-counter increase with reset handling (the
    Prometheus/TimescaleDB ``counter_agg``/``increase()`` semantics):
    per key, total increase = Σ max(delta, 0) over consecutive
    samples, where a NEGATIVE delta means the counter reset and the
    new sample counts in full — bytes-sent, request-count, any
    restart-prone cumulative gauge.

    One lag window (total order via the tiebreak) + one aggregate.
    Returns (key, n_samples, n_resets, increase, rate_per_s) with
    rate over the observed span (0 span -> rate 0)."""
    from pyspark.sql import Window

    wo = Window.partitionBy("key").orderBy("t", "tb")
    t = F.col(ts_col).cast("double")
    s = (df.select(F.col(key_col).alias("key"), t.alias("t"),
                   F.col(value_col).cast("double").alias("v"),
                   F.col(tiebreak_col).alias("tb"))
         .withColumn("v_prev", F.lag("v").over(wo)))
    delta = F.col("v") - F.col("v_prev")
    inc = (F.when(F.col("v_prev").isNull(), 0.0)
           .when(delta >= 0, delta)
           .otherwise(F.col("v")))       # reset: new epoch counts whole
    agg = (s.groupBy("key")
           .agg(F.count(F.lit(1)).alias("n_samples"),
                F.sum((delta < 0).cast("long")).alias("n_resets"),
                F.sum(inc).alias("increase"),
                (F.max("t") - F.min("t")).alias("span")))
    return agg.select(
        F.col("key").alias(key_col), "n_samples",
        F.coalesce("n_resets", F.lit(0)).alias("n_resets"),
        F.round("increase", round_dp).alias("increase"),
        F.round(F.when(F.col("span") > 0,
                       F.col("increase") / F.col("span"))
                 .otherwise(0.0), round_dp + 2).alias("rate_per_s"))


@register("rolling_active_users", PluginType.TRANSFORMER)
def rolling_active_users(df: DataFrame, entity_col: str, ts_col: str,
                         window_days: int = 7,
                         granule_s: int = 86_400,
                         round_dp: int = 4) -> DataFrame:
    """Rolling N-day active entities per day (the WAU/MAU curve) plus
    the DAU/WAU stickiness ratio — the growth dashboard's headline
    line, which cumulative_unique (all-time) and growth_accounting
    (single-period) cannot give.

    A distinct (entity, day) table joined to a CONSTANT-width day
    range (each activity row lands in ``window_days`` buckets — an
    explode bounded by the window, not the data), then one distinct
    count per day.  Days with zero activity in range don't appear
    (join densification lives in fill_time_gaps).  Returns
    (day, dau, rolling_active, stickiness)."""
    day = F.floor(F.col(ts_col) / granule_s).cast("long")
    act = (df.select(F.col(entity_col).alias("u"), day.alias("d"))
           .distinct())
    spread = act.select(
        "u", F.explode(F.sequence(F.col("d"),
                                  F.col("d") + window_days - 1))
        .alias("day"))
    rolling = (spread.groupBy("day")
               .agg(F.count_distinct("u").alias("rolling_active")))
    dau = act.groupBy(F.col("d").alias("day")).agg(
        F.count_distinct("u").alias("dau"))
    lo_hi = act.agg(F.min("d").alias("lo"), F.max("d").alias("hi")).first()
    return (rolling.join(dau, "day", "left")
            .where((F.col("day") >= lo_hi["lo"] + window_days - 1)
                   & (F.col("day") <= lo_hi["hi"]))
            .select("day", F.coalesce("dau", F.lit(0)).alias("dau"),
                    "rolling_active",
                    F.round(F.coalesce("dau", F.lit(0))
                            / F.col("rolling_active"), round_dp)
                    .alias("stickiness")))


@register("nelson_aalen", PluginType.TRANSFORMER)
def nelson_aalen(df: DataFrame, duration_col: str, event_col: str,
                 group_col: str | None = None,
                 round_dp: int = 4) -> DataFrame:
    """Nelson–Aalen cumulative hazard H(t) = Σ_{t_i <= t} d_i / n_i —
    Kaplan–Meier's additive sibling: where S(t) answers "what fraction
    survives", H(t) answers "how much hazard has accumulated" and its
    slope reads as the instantaneous event rate (flat = stable,
    steepening = wear-out).  exp(−H) is the Fleming–Harrington
    survival estimate, included for the KM cross-check.

    Identical distribution shape to kaplan_meier: one (group, t)
    aggregate, reverse-cumulative at-risk window, forward cumulative
    sum — per-group state is distinct durations only."""
    from pyspark.sql import Window

    gcols = [group_col] if group_col else []
    grouped = (df.groupBy(*gcols, F.col(duration_col).alias("t"))
               .agg(F.sum(F.col(event_col).cast("long")).alias("d"),
                    F.count(F.lit(1)).alias("total")))
    w_rev = (Window.partitionBy(*gcols).orderBy(F.col("t").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    at_risk = grouped.withColumn("n_at_risk", F.sum("total").over(w_rev))
    ev = at_risk.where(F.col("d") > 0)
    w_fwd = (Window.partitionBy(*gcols).orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    h = F.sum(F.col("d") / F.col("n_at_risk")).over(w_fwd)
    return ev.select(*gcols, "t", "n_at_risk", "d",
                     F.round(h, round_dp).alias("cum_hazard"),
                     F.round(F.exp(-h), round_dp).alias("fh_survival"))


@register("rolling_slope", PluginType.TRANSFORMER)
def rolling_slope(df: DataFrame, key_col: str, ts_col: str,
                  value_col: str, tiebreak_col: str,
                  window: int = 7, round_dp: int = 4) -> DataFrame:
    """Rolling OLS trend slope over the last ``window`` samples (per
    key, against the actual timestamps — irregular sampling handled):

        b = (k·Σty − Σt·Σy) / (k·Σt² − (Σt)²)

    — the live trend detector (is this metric rising NOW?) that EWMA
    levels and global fits (robust_slope) don't give.  All four
    running sums share ONE constant-k window frame, so the plan is a
    single sort + one WindowExec; t is re-centered on the frame's
    first sample before squaring so Σt² stays well-conditioned at
    epoch magnitudes.  Frames shorter than 2 points yield NULL.
    Appends ``slope`` (value units per second)."""
    from pyspark.sql import Window

    w = (Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
         .rowsBetween(-(window - 1), 0))
    # the re-centering origin depends on the FRAME (its first sample),
    # so the sums fold over the collected frame array — sequential
    # in-order float64, identical on any engine
    arr = F.collect_list(F.struct(
        F.col(ts_col).cast("double").alias("t"),
        F.col(value_col).cast("double").alias("y"))).over(w)
    k = F.size(arr)
    tmin = F.element_at(arr, 1)["t"]
    zero = F.lit(0.0)
    st = F.aggregate(arr, zero, lambda a, x: a + (x["t"] - tmin))
    sy = F.aggregate(arr, zero, lambda a, x: a + x["y"])
    sty = F.aggregate(arr, zero,
                      lambda a, x: a + (x["t"] - tmin) * x["y"])
    stt = F.aggregate(arr, zero,
                      lambda a, x: a + (x["t"] - tmin) * (x["t"] - tmin))
    denom = k * stt - st * st
    slope = F.when((k >= 2) & (denom != 0),
                   (k * sty - st * sy) / denom)
    return df.withColumn("slope", F.round(slope, round_dp))
