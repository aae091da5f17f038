"""ML feature-engineering transforms with leakage discipline — the
encodings a tabular/training pipeline applies before model fitting.

Partner modules: operators/classifier.py consumes hashed text features;
operators/text.py:split_assign_grouped guards split leakage; this
module guards TARGET leakage — encodings derived from the label must
exclude each row's own label (leave-one-out), or the feature memorizes
the answer.

Everything is window/aggregate arithmetic — no UDFs, one shuffle per
encoding on the category key — and exactly replayable in SQL (the
oracle refits the encoding end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("target_encode_loo", PluginType.TRANSFORMER)
def target_encode_loo(df: DataFrame, cat_col: str, target_col: str,
                      prior_weight: float = 10.0,
                      out_col: str = "te",
                      round_dp: int = 4) -> DataFrame:
    """Leave-one-out target (mean) encoding with additive smoothing:

        te_i = (sum_g - y_i + m * prior) / (n_g - 1 + m)

    where sum_g/n_g are the row's category aggregates, prior is the
    GLOBAL target mean, and m = ``prior_weight`` pseudo-observations
    pull small categories toward the prior (the standard shrinkage that
    keeps 1-row categories from exploding: with n_g = 1 the formula
    degenerates to exactly the prior).  Excluding the row's own label
    is what makes the feature safe to train on.

    One aggregate on the category key + one broadcast-sized global
    scalar; the join back is on the same key as the aggregate, so AQE
    reuses the exchange.  Null categories encode to the prior.
    """
    # the encoding's arithmetic is defined over DOUBLE: a DECIMAL
    # target (dtype probe) would collect the prior as decimal.Decimal,
    # which Python refuses to mix with float pseudo-counts, and the
    # exact decimal sums would diverge from the double replay anyway
    if dict(df.dtypes).get(target_col, "").startswith("decimal"):
        df = df.withColumn(target_col, F.col(target_col).cast("double"))
    prior = df.agg(F.avg(target_col)).first()[0]
    if prior is None:
        raise ValueError("target_encode_loo: no non-null targets")
    prior = float(prior)
    per = (df.where(F.col(cat_col).isNotNull())
           .groupBy(cat_col)
           .agg(F.sum(target_col).alias("__sum"),
                F.count(target_col).alias("__n")))
    joined = df.join(per, cat_col, "left")
    m = float(prior_weight)
    # rows with a null target were never counted in (__sum, __n), so
    # they take the plain smoothed mean; rows with no category (or an
    # unseen one after the left join) take exactly the prior
    loo = ((F.col("__sum") - F.col(target_col) + m * prior) /
           (F.col("__n") - 1 + m))
    plain = ((F.col("__sum") + m * prior) / (F.col("__n") + m))
    te = (F.when(F.col("__n").isNull(), F.lit(prior))
           .when(F.col(target_col).isNull(), plain)
           .otherwise(loo))
    return (joined.withColumn(out_col, F.round(te, round_dp))
            .drop("__sum", "__n"))


@register("quantile_bucket", PluginType.TRANSFORMER)
def quantile_bucket(df: DataFrame, value_col: str,
                    n_buckets: int, tiebreak_cols: list[str],
                    out_col: str = "bucket",
                    num_partitions: int | None = None) -> DataFrame:
    """Equal-frequency discretization with EXACT bucket boundaries:
    every row gets bucket = floor(rank · n_buckets / N) where rank is
    the row's exact global 0-based position under (value, tiebreaks)
    order.  Unlike approxQuantile binning, the bucket populations are
    balanced to within one row and the assignment is deterministic, so
    the whole discretization replays in SQL (row_number + the same
    floor algebra).

    Distribution: NO single-partition window — the exact global rank
    uses the two-phase distributed prefix sum (range-partition on the
    sort key, one COUNT per partition to the driver, broadcast the
    offsets, partition-local row_number), the same recipe as
    text.epoch_order / pack_sequences.  Driver state = one long per
    partition."""
    order = [F.col(value_col).asc()] + [F.col(c).asc()
                                        for c in tiebreak_cols]
    # a NULL value is not discretizable: it gets a NULL bucket and sits
    # outside the rank/total arithmetic (Spark would rank NULLs FIRST,
    # SQL row_number LAST — no oracle could mirror a ranked NULL)
    nulls = df.where(F.col(value_col).isNull()) \
              .withColumn(out_col, F.lit(None).cast("int"))
    df = df.where(F.col(value_col).isNotNull())
    n_parts = (num_partitions
               or df.sparkSession.sparkContext.defaultParallelism)
    parted = (df.repartitionByRange(n_parts, *order)
              .withColumn("__pid", F.spark_partition_id())
              .persist())
    try:
        subtotals = (parted.groupBy("__pid")
                     .agg(F.count(F.lit(1)).alias("c")).collect())
        run, offsets = 0, {}
        for r in sorted(subtotals, key=lambda r: r["__pid"]):
            offsets[r["__pid"]] = run
            run += r["c"]
        total = run
        if offsets:
            off_map = F.create_map(
                *[F.lit(v) for kv in offsets.items() for v in kv])
            part_start = off_map[F.col("__pid")]
        else:
            part_start = F.lit(0)
        w = Window.partitionBy("__pid").orderBy(*order)
        rank = (F.row_number().over(w) - 1 + part_start).cast("bigint")
        bucket = F.floor(rank * n_buckets / F.lit(max(total, 1))) \
            .cast("int") + 1
        return (parted.withColumn(out_col, bucket).drop("__pid")
                .unionByName(nulls))
    except Exception:
        parted.unpersist()
        raise


@register("mutual_information", PluginType.TRANSFORMER)
def mutual_information(df: DataFrame, col_a: str, col_b: str
                       ) -> DataFrame:
    """Mutual information I(A;B) = Σ p(a,b)·ln(p(a,b)/(p(a)p(b)))
    between two categorical columns — the model-free dependence score
    used for feature selection and leakage audits (an input column
    with high MI against the label is either a great feature or a
    leak).

    Distribution: one (a,b) hash aggregation; the marginals are window
    sums over that (tiny, |A|·|B|-row) contingency table, never a
    second pass over the data.  Returns ONE row: (mi_nats, n)."""
    joint = (df.where(F.col(col_a).isNotNull()
                      & F.col(col_b).isNotNull())
             .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
             .agg(F.count(F.lit(1)).alias("c")))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wn = Window.partitionBy()
    ca = F.sum("c").over(wa).cast("double")
    cb = F.sum("c").over(wb).cast("double")
    n = F.sum("c").over(wn).cast("double")
    # log-domain algebra: c*n and ca*cb as long products would
    # overflow past ~3e9 rows
    term = (F.col("c") / n) * (F.log("c") + F.log(n)
                               - F.log(ca) - F.log(cb))
    return (joint.select(term.alias("t"), F.col("c"))
            .agg(F.sum("t").alias("mi_nats"),
                 F.sum("c").alias("n")))


@register("rfm_segment", PluginType.TRANSFORMER)
def rfm_segment(orders: DataFrame, customer_col: str, date_col,
                amount_col: str, n_tiles: int = 5) -> DataFrame:
    """RFM segmentation: per customer, Recency (latest order date),
    Frequency (order count), Monetary (total spend), each discretized
    into ``n_tiles`` equal-frequency tiles by the deterministic
    floor-rank rule (quantile_bucket's algebra, customer id as
    tiebreak), plus the combined RFM code.

    One aggregation to the per-customer table, then three rank
    windows over THAT table (customer-count sized, not order-count);
    at catalog scale swap in operators/ranks.global_rank — the algebra
    is identical.  Higher tile = better (more recent / frequent /
    valuable).  Output: (customer, recency, frequency, monetary,
    r_tile, f_tile, m_tile, rfm_code)."""
    from pyspark.sql import Window

    per = (orders.groupBy(F.col(customer_col).alias("cust"))
           .agg(F.max(date_col).alias("recency"),
                F.count(F.lit(1)).alias("frequency"),
                F.sum(amount_col).alias("monetary"))
           # RFM needs all three dimensions: an anonymous customer or
           # one with no dated/priced orders has no rank position, and
           # Spark/SQL disagree on where NULLs rank
           .where(F.col("cust").isNotNull()
                  & F.col("recency").isNotNull()
                  & F.col("monetary").isNotNull()))
    n = per.count()

    def tile(order_cols, name):
        w = Window.orderBy(*order_cols)
        rank = F.row_number().over(w) - 1
        return (F.floor(rank * n_tiles / F.lit(max(n, 1)))
                .cast("int") + 1).alias(name)

    tiled = per.select(
        "cust", "recency", "frequency", "monetary",
        tile([F.col("recency").asc(), F.col("cust").asc()], "r_tile"),
        tile([F.col("frequency").asc(), F.col("cust").asc()], "f_tile"),
        tile([F.col("monetary").asc(), F.col("cust").asc()], "m_tile"))
    return tiled.withColumn(
        "rfm_code",
        F.concat(F.col("r_tile").cast("string"),
                 F.col("f_tile").cast("string"),
                 F.col("m_tile").cast("string")))


@register("woe_iv", PluginType.TRANSFORMER)
def woe_iv(df: DataFrame, bin_col: str, target_col: str,
           smoothing: float = 0.5, round_dp: int = 6) -> DataFrame:
    """Weight-of-Evidence / Information-Value table for a binned (or
    categorical) feature against a binary target — the credit-scoring
    screen for feature predictiveness (IV < 0.02 useless, > 0.5
    suspicious/leaky).  Parity target: the reference exposes no
    scorecard tooling; this extends the training-data lane
    (SURVEY.md §2 extension brief, feature screening before model fit).

        woe_b = ln( (events_b + s) / (E + 2s)
                  / ((n_b - events_b + s) / (NE + 2s)) )
        iv    = Σ_b (pct_event_b − pct_nonevent_b) · woe_b

    with ``s`` Laplace smoothing so empty cells never divide by zero;
    pct's use the same smoothed masses, so iv is exactly the sum of the
    per-bin contributions it reports.

    Distribution: ONE hash aggregation on the bin key (integer event
    counts — exact, engine-independent), then window sums over the
    |bins|-row table.  Returns one row per bin:
    (bin, n, events, woe, iv_contrib) plus the feature-level ``iv``
    repeated on every row (window total, no second pass)."""
    y = F.col(target_col).cast("double")
    per = (df.groupBy(F.col(bin_col).alias("bin"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.when(y != 0, 1).otherwise(0)).alias("events")))
    w = Window.partitionBy()
    s = float(smoothing)
    ev_tot = F.sum("events").over(w).cast("double")
    n_tot = F.sum("n").over(w).cast("double")
    ne_tot = n_tot - ev_tot
    pe = (F.col("events") + s) / (ev_tot + 2 * s)
    pne = (F.col("n") - F.col("events") + s) / (ne_tot + 2 * s)
    woe = F.log(pe / pne)
    contrib = (pe - pne) * woe
    stats = per.select(
        "bin", "n", "events",
        F.round(woe, round_dp).alias("woe"),
        F.round(contrib, round_dp).alias("iv_contrib"),
        F.round(F.sum(contrib).over(w), round_dp).alias("iv"))
    return stats
