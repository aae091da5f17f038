"""Frequent-itemset / association-rule mining over basket-shaped data.

A training-data and analytics staple with no counterpart in the
reference (its aggregations are per-entity, never cross-item): which
tags/domains/brands co-occur, with support / confidence / lift — the
first Apriori pass (pairs), which in practice is what powers
"co-occurring labels" and "related items" dashboards.

Spark-first shape, 100 TB design:

    baskets   = distinct (basket, item) — one hash shuffle
    freq      = groupBy(item) count -> min-support filter; the Apriori
                property means only frequent items can appear in a
                frequent pair, so infrequent items are pruned BEFORE the
                quadratic step (broadcast semi join — the frequent-item
                list is small by construction)
    pairs     = self-join on basket (co-partitioned: both sides are the
                same shuffle output, AQE reuses the exchange) with
                item_a < item_b, then groupBy(pair) count
    rules     = pair counts ⋈ broadcast(item counts) twice — all
                broadcast, no extra wide shuffle

A single viral basket with B items contributes C(B,2) pairs; baskets
larger than ``max_basket_size`` are dropped entirely (dropping, not
truncating, keeps support counts exact over the retained population and
is logged) — the same runaway guard policy as interval_join /
fill_time_gaps.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

log = logging.getLogger(__name__)


@register("association_rules", PluginType.TRANSFORMER)
def association_rules(df: DataFrame, basket_col: str, item_col: str,
                      min_support: float = 0.01,
                      min_confidence: float = 0.0,
                      max_basket_size: int = 10_000,
                      round_dp: int = 4) -> DataFrame:
    """Pairwise association rules (antecedent -> consequent) with
    support / confidence / lift.

    Support counts are over distinct baskets (an item twice in one
    basket counts once — the standard market-basket convention).  Both
    directions of each frequent pair are emitted; confidence differs per
    direction, support and lift do not.

    Output: (antecedent, consequent, pair_count, support, confidence,
    lift), doubles rounded to ``round_dp``.
    """
    # a NULL basket id is not a co-occurrence context (q189 pin)
    baskets = (df.select(F.col(basket_col).alias("__basket"),
                         F.col(item_col).alias("__item"))
               .where(F.col(item_col).isNotNull()
                      & F.col(basket_col).isNotNull())
               .distinct())

    # one aggregation pass sizes every basket; one scalar job derives
    # BOTH the kept-basket universe size and the dropped count (no
    # second distinct-count over the corpus)
    sizes = baskets.groupBy("__basket").agg(
        F.count(F.lit(1)).alias("__sz")).localCheckpoint(eager=True)
    tot = sizes.agg(
        F.count(F.lit(1)).alias("n_tot"),
        F.sum(F.when(F.col("__sz") <= max_basket_size, 1)
               .otherwise(0)).alias("n_keep")).first()
    n_baskets = int(tot.n_keep or 0)
    n_dropped = int(tot.n_tot or 0) - n_baskets
    if n_dropped:
        log.warning("association_rules: dropped %d baskets larger than "
                    "max_basket_size=%d", n_dropped, max_basket_size)
        # the size filter joins on the SAME key the groupBy shuffled on,
        # so AQE reuses the exchange — never a broadcast of the (corpus-
        # sized) basket universe
        keep = sizes.where(F.col("__sz") <= max_basket_size)
        baskets = baskets.join(keep.select("__basket"), "__basket")

    if n_baskets == 0:
        return (baskets.select(
            F.col("__item").alias("antecedent"),
            F.col("__item").alias("consequent"),
            F.lit(0).cast("long").alias("pair_count"),
            F.lit(0.0).alias("support"),
            F.lit(0.0).alias("confidence"),
            F.lit(0.0).alias("lift")).limit(0))
    min_count = max(1, int(min_support * n_baskets))

    item_counts = baskets.groupBy("__item").agg(
        F.count(F.lit(1)).alias("__n_item"))
    frequent = item_counts.where(F.col("__n_item") >= min_count)

    pruned = baskets.join(F.broadcast(frequent.select("__item")), "__item")
    a = pruned.select("__basket", F.col("__item").alias("__a"))
    b = pruned.select("__basket", F.col("__item").alias("__b"))
    pair_counts = (a.join(b, "__basket")
                   .where(F.col("__a") < F.col("__b"))
                   .groupBy("__a", "__b")
                   .agg(F.count(F.lit(1)).alias("pair_count"))
                   .where(F.col("pair_count") >= min_count))

    both = pair_counts.unionByName(
        pair_counts.select(F.col("__b").alias("__a"),
                           F.col("__a").alias("__b"), "pair_count"))
    ante = frequent.select(F.col("__item").alias("__a"),
                           F.col("__n_item").alias("__n_a"))
    cons = frequent.select(F.col("__item").alias("__b"),
                           F.col("__n_item").alias("__n_b"))
    rules = (both.join(F.broadcast(ante), "__a")
             .join(F.broadcast(cons), "__b")
             .select(
                 F.col("__a").alias("antecedent"),
                 F.col("__b").alias("consequent"),
                 "pair_count",
                 F.round(F.col("pair_count") / F.lit(float(n_baskets)),
                         round_dp).alias("support"),
                 F.round(F.col("pair_count") / F.col("__n_a"),
                         round_dp).alias("confidence"),
                 F.round(F.col("pair_count") * F.lit(float(n_baskets))
                         / (F.col("__n_a") * F.col("__n_b")),
                         round_dp).alias("lift")))
    return rules.where(F.col("confidence") >= min_confidence)


@register("sequence_pairs", PluginType.TRANSFORMER)
def sequence_pairs(events: DataFrame, user_col: str, ts_col: str,
                   type_col: str, window_s: int,
                   min_users: int = 2,
                   max_user_events: int = 10_000) -> DataFrame:
    """Ordered sequential patterns of length 2 with a gap constraint
    (the first PrefixSpan pass): "A then B within ``window_s``
    seconds", counted ONCE per user — cross-user support, the metric
    behind "users who viewed X go on to buy Y" mining.  Unlike
    next-event transition counts (timeseries.py), the pair need NOT be
    adjacent: any later same-user event inside the window matches.

    Distribution: the self-join is on the user key, so both sides hash
    to the same partitions (one shuffle, AQE reuses the exchange); the
    time bound caps the per-user pair fan-out.  Users with more than
    ``max_user_events`` events are dropped whole (exact support over
    the retained population — the association_rules viral-basket
    policy).  Support denominators use the retained-user count.

    Returns (type_a, type_b, n_users, support) for pairs reaching
    ``min_users`` distinct users.
    """
    # a NULL user is not a user: it can never self-join (a.u == b.u
    # fails on NULL) yet distinct().count() would tally it into the
    # support denominator — excluded up front
    ev = (events.where(F.col(user_col).isNotNull())
          .select(F.col(user_col).alias("u"),
                  F.col(ts_col).cast("long").alias("t"),
                  F.col(type_col).alias("ty")))
    sized = ev.groupBy("u").agg(F.count(F.lit(1)).alias("__n"))
    big = sized.where(F.col("__n") > max_user_events)
    n_big = big.count()
    if n_big:
        log.warning("sequence_pairs: dropping %d users over "
                    "max_user_events=%d", n_big, max_user_events)
        ev = ev.join(F.broadcast(big.select("u")), "u", "left_anti")
    n_users_total = ev.select("u").distinct().count()
    a, b = ev.alias("a"), ev.alias("b")
    pairs = (a.join(b, (F.col("a.u") == F.col("b.u"))
                    & (F.col("a.t") < F.col("b.t"))
                    & (F.col("b.t") <= F.col("a.t") + window_s))
             .select(F.col("a.u").alias("u"),
                     F.col("a.ty").alias("type_a"),
                     F.col("b.ty").alias("type_b"))
             .distinct())
    return (pairs.groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .where(F.col("n_users") >= min_users)
            .withColumn("support",
                        F.round(F.col("n_users")
                                / F.lit(float(max(n_users_total, 1))),
                                6)))


@register("frequent_triples", PluginType.TRANSFORMER)
def frequent_triples(df: DataFrame, basket_col: str, item_col: str,
                     min_support: float = 0.01,
                     round_dp: int = 4) -> DataFrame:
    """Frequent 3-itemsets, Apriori-pruned (the level-3 extension of
    association_rules' pairs): a triple can only be frequent if ALL
    THREE of its pairs are, so candidate generation joins the
    frequent-PAIR table against a third basket item and semi-joins the
    two new pairs against the frequent-pair set BEFORE counting —
    the pruning that keeps level-3 from going cubic on dense baskets.

    Shape: item prune → pair count (a<b self-join on the basket) →
    triple extension (equi-join on basket, c>b) → two broadcast semi
    joins on the (small) frequent-pair set → final count.  Support is
    distinct-basket count, consistent with association_rules.
    Returns (item_a, item_b, item_c, triple_count, support)."""
    baskets = (df.select(F.col(basket_col).alias("bk"),
                         F.col(item_col).alias("it"))
               .where(F.col(item_col).isNotNull()
                      & F.col(basket_col).isNotNull()).distinct())
    n_baskets = baskets.select("bk").distinct().count()
    if n_baskets == 0:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "item_a string, item_b string, item_c string, "
                "triple_count long, support double")
    minc = max(1, int(min_support * n_baskets))
    freq_items = (baskets.groupBy("it")
                  .agg(F.count(F.lit(1)).alias("n"))
                  .where(F.col("n") >= minc).select("it"))
    pruned = baskets.join(F.broadcast(freq_items), "it").select("bk", "it")
    a = pruned.select("bk", F.col("it").alias("ia"))
    b = pruned.select("bk", F.col("it").alias("ib"))
    pair_ev = a.join(b, "bk").where(F.col("ia") < F.col("ib"))
    fpairs = (pair_ev.groupBy("ia", "ib")
              .agg(F.count(F.lit(1)).alias("pn"))
              .where(F.col("pn") >= minc)
              .select("ia", "ib").localCheckpoint(eager=True))
    c = pruned.select("bk", F.col("it").alias("ic"))
    cand = (pair_ev.join(F.broadcast(fpairs), ["ia", "ib"])
            .join(c, "bk").where(F.col("ic") > F.col("ib")))
    cand = cand.join(
        F.broadcast(fpairs.select(F.col("ia").alias("ia2"),
                                  F.col("ib").alias("ic2"))),
        (F.col("ia") == F.col("ia2")) & (F.col("ic") == F.col("ic2")),
        "left_semi")
    cand = cand.join(
        F.broadcast(fpairs.select(F.col("ia").alias("ib3"),
                                  F.col("ib").alias("ic3"))),
        (F.col("ib") == F.col("ib3")) & (F.col("ic") == F.col("ic3")),
        "left_semi")
    return (cand.groupBy(F.col("ia").alias("item_a"),
                         F.col("ib").alias("item_b"),
                         F.col("ic").alias("item_c"))
            .agg(F.count(F.lit(1)).alias("triple_count"))
            .where(F.col("triple_count") >= minc)
            .withColumn("support",
                        F.round(F.col("triple_count")
                                / F.lit(float(n_baskets)), round_dp)))
