"""Scale probe: how do the core operators behave when the fact table grows
16x beyond the largest test SF?  Unions lineitem with shifted keys to ~10M
rows, times the headline aggregate/join/top-k, and prints rows/sec so the
claim "the plan survives a scale-up" has a number behind it.

Usage: python tools/scale_probe.py [multiplier]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from niamoto_spark.session import get_spark

    spark = get_spark("scale_probe")
    sf = "/root/testdata/sf0.1"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    part = spark.read.parquet(f"{sf}/part.parquet")

    pieces = [li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
              for i in range(mult)]
    big = pieces[0]
    for p in pieces[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).cache()
    n = big.count()  # materialize once
    print(f"# inflated lineitem: {n:,} rows ({mult}x sf0.1)")

    def timed(label, df):
        t0 = time.time()
        df.count()
        dt = time.time() - t0
        print(f"{label}: {dt:.2f}s  ({n / dt / 1e6:.1f}M rows/s)")
        return dt

    px, d = F.col("l_extendedprice"), F.col("l_discount")
    timed("pricing_summary (8-agg groupBy)",
          big.groupBy("l_returnflag", "l_linestatus").agg(
              F.sum("l_quantity"), F.sum(px), F.sum(px * (1 - d)),
              F.avg("l_quantity"), F.count(F.lit(1))))
    timed("broadcast join + top-k",
          big.join(F.broadcast(part), big.l_partkey == part.p_partkey)
             .groupBy("p_brand").count()
             .orderBy(F.col("count").desc(), "p_brand").limit(10))
    timed("exact median per group",
          big.groupBy("l_returnflag").agg(F.median("l_quantity")))
    timed("hash dedup (md5 keys)",
          big.select(F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber"))
                     .alias("k")).groupBy("k").count())
    timed("weighted top-k sample (A-Res TakeOrdered)",
          big.withColumn(
              "__k",
              -F.log((F.conv(F.substring(
                  F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")),
                  1, 8), 16, 10).cast("bigint") + 0.5) / F.lit(2.0 ** 32))
              / F.col("l_quantity"))
          .orderBy("__k").limit(100))

    # round-6 event operators on an inflated events table
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ev_pieces = [ev.withColumn("event_id",
                               F.col("event_id") + F.lit(i * 10_000_000))
                 .withColumn("user_id",
                             F.col("user_id") + F.lit(i * 1000))
                 for i in range(mult)]
    bev = ev_pieces[0]
    for p in ev_pieces[1:]:
        bev = bev.unionByName(p)
    from pyspark.sql import types as T
    ts_sec = (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000) \
        .cast("long") if isinstance(ev.schema["ts"].dataType,
                                    (T.TimestampType, T.TimestampNTZType)) \
        else (F.col("ts") / 1_000_000_000).cast("long")
    bev = bev.withColumn("ts_sec", ts_sec).repartition(32).cache()
    ne = bev.count()
    print(f"# inflated events: {ne:,} rows ({mult}x sf0.1)")

    from niamoto_spark.operators.history import scd2_history
    from niamoto_spark.operators.interval import interval_join

    t0 = time.time()
    purchases = bev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts_sec").alias("ws"),
        (F.col("ts_sec") + 1800).alias("we"))
    clicks = bev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts_sec").alias("cts"))
    interval_join(clicks, purchases, on="user_id", point_ts="cts",
                  start_col="ws", end_col="we",
                  granule_s=3600).count()
    dt = time.time() - t0
    print(f"interval_join (granule equi): {dt:.2f}s "
          f"({ne / dt / 1e6:.1f}M rows/s)")

    t0 = time.time()
    scd2_history(bev.select("user_id", "event_type", "ts_sec", "event_id"),
                 ["user_id"], "ts_sec", ["event_type"],
                 order_cols=["event_id"]).count()
    dt = time.time() - t0
    print(f"scd2_history (1-Exchange windows): {dt:.2f}s "
          f"({ne / dt / 1e6:.1f}M rows/s)")

    # manifest zone-map pruning effectiveness at scale: sort-clustered
    # compaction -> a 1%-selectivity range read should SKIP ~99% of files
    # and run in a small fraction of the full-scan time.
    import shutil
    import tempfile

    from niamoto_spark.sources import manifest as M

    tdir = tempfile.mkdtemp(prefix="probe_manifest_")
    tbl = os.path.join(tdir, "tbl")
    try:
        M.append(big.select("l_orderkey", "l_partkey", "l_quantity",
                            "l_extendedprice"), tbl)
        M.compact(spark, tbl, target_files=64, sort_by=["l_orderkey"])
        lo = 3_000_000
        hi = lo + int(mult * 10_000_000 * 0.01)   # ~1% of the key space
        t0 = time.time()
        full = M.read_table(spark, tbl).where(
            (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
        ).count()
        dt_full = time.time() - t0
        t0 = time.time()
        df, read, skipped = M.read_table_pruned(
            spark, tbl, "l_orderkey", lo, hi)
        pruned = df.count()
        dt_pruned = time.time() - t0
        assert pruned == full, (pruned, full)
        print(f"manifest zone-map prune: skipped {skipped}/{read + skipped} "
              f"files ({100 * skipped / (read + skipped):.0f}%), "
              f"{dt_full:.2f}s full -> {dt_pruned:.2f}s pruned "
              f"({dt_full / max(dt_pruned, 1e-9):.1f}x)")

        # z-order clustering: after Morton-clustering on (orderkey,
        # partkey), range reads on EITHER column should skip most files
        # (single-column clustering leaves the second column unprunable).
        M.compact(spark, tbl, target_files=64,
                  sort_by=["l_orderkey", "l_partkey"], cluster="zorder")
        pk_max = M.read_table(spark, tbl).agg(
            F.max("l_partkey")).first()[0]
        for col, sel_hi in (("l_orderkey", hi),
                            ("l_partkey", int(pk_max * 0.05))):
            _, read, skipped = M.read_table_pruned(
                spark, tbl, col, 0, sel_hi)
            print(f"zorder prune on {col}: skipped {skipped}/"
                  f"{read + skipped} files "
                  f"({100 * skipped / (read + skipped):.0f}%)")
    finally:
        shutil.rmtree(tdir, ignore_errors=True)

    # Bloom join pruning at scale: dim = 1% of orderkeys; the literal-
    # bitmap filter cuts the fact side BEFORE the join exchange.
    from niamoto_spark.operators.bloomjoin import bloom_prune

    dim = (big.select("l_orderkey").distinct()
           .where(F.col("l_orderkey") % 100 == 0))
    t0 = time.time()
    kept = bloom_prune(big, dim, "l_orderkey", "l_orderkey").count()
    dt = time.time() - t0
    print(f"bloom_prune 1%-dim: {n:,} -> {kept:,} rows in {dt:.2f}s "
          f"({n / dt / 1e6:.1f}M rows/s probe)")

    # Global epoch shuffle: exact positions over the inflated corpus —
    # the two-phase prefix sum must stay linear.
    from niamoto_spark.operators.text import epoch_order

    ids = big.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("doc_id"))
    t0 = time.time()
    epoch_order(ids, "doc_id", seed=1).count()
    dt = time.time() - t0
    print(f"epoch_order (exact global positions): {dt:.2f}s "
          f"({n / dt / 1e6:.1f}M rows/s)")

    # Round-7 continuation: window-sort detectors and the mining lane.
    from niamoto_spark.operators.timeseries import (cusum_changepoints,
                                                    ewma)

    t0 = time.time()
    ewma(bev, "user_id", "event_id", "value", alpha=0.3,
         lookback=40).count()
    dt = time.time() - t0
    print(f"ewma (41-term lag-sum, 1 window sort): {dt:.2f}s "
          f"({ne / dt / 1e6:.1f}M rows/s)")

    t0 = time.time()
    cusum_changepoints(bev, "user_id", "event_id", "value",
                       target=50.0, slack=5.0, threshold=200.0).count()
    dt = time.time() - t0
    print(f"cusum (prefix-sum identity, 1 Exchange): {dt:.2f}s "
          f"({ne / dt / 1e6:.1f}M rows/s)")

    from niamoto_spark.operators.itemsets import association_rules

    baskets = (big.join(F.broadcast(part),
                        big.l_partkey == part.p_partkey)
               .select("l_orderkey", "p_brand"))
    t0 = time.time()
    nr = association_rules(baskets, "l_orderkey", "p_brand",
                           min_support=0.01).count()
    dt = time.time() - t0
    print(f"association_rules (Apriori-pruned pair join): {dt:.2f}s "
          f"({n / dt / 1e6:.1f}M basket rows/s, {nr} rules)")

    from niamoto_spark.operators.drift import ks_statistic

    t0 = time.time()
    ks_statistic(big.where(F.col("l_returnflag") == "R")
                 .select("l_quantity"),
                 big.where(F.col("l_returnflag") == "N")
                 .select("l_quantity"), "l_quantity").count()
    dt = time.time() - t0
    print(f"ks_statistic (per-value counts + tiny ordered pass): "
          f"{dt:.2f}s ({n / dt / 1e6:.1f}M rows/s)")


    # Round-7 tail: the eval/fit/quota lane at 16x.
    from niamoto_spark.operators.mleval import binary_auc

    t0 = time.time()
    binary_auc(big.select(
        F.round("l_extendedprice", 0).alias("s"),
        (F.col("l_orderkey") % 2).alias("y")), "s", "y").collect()
    dt = time.time() - t0
    print(f"binary_auc (per-score agg + value-table window): {dt:.2f}s "
          f"({n / dt / 1e6:.1f}M rows/s)")

    from niamoto_spark.operators.regression import ols_fit2

    t0 = time.time()
    ols_fit2(big, "l_extendedprice", "l_quantity", "l_discount",
             "l_returnflag").collect()
    dt = time.time() - t0
    print(f"ols_fit2 (two-pass centered normal equations): {dt:.2f}s "
          f"({n / dt / 1e6:.1f}M rows/s)")

    from niamoto_spark.operators.features import quantile_bucket

    t0 = time.time()
    quantile_bucket(big, "l_extendedprice", 10,
                    ["l_orderkey", "l_linenumber"]).count()
    dt = time.time() - t0
    print(f"quantile_bucket (two-phase exact rank, 10 buckets): "
          f"{dt:.2f}s ({n / dt / 1e6:.1f}M rows/s)")

    from niamoto_spark.operators.timeseries import position_attribution

    t0 = time.time()
    position_attribution(bev, "user_id", "event_id", "event_type",
                         F.col("event_type") == "purchase").collect()
    dt = time.time() - t0
    print(f"position_attribution (2 per-user windows): {dt:.2f}s "
          f"({ne / dt / 1e6:.1f}M rows/s)")

    # Session-2 additions: hidden partitioning, deletion vectors,
    # incremental join maintenance, stump splits at 16x.
    tdir2 = tempfile.mkdtemp(prefix="probe_hidp_")
    try:
        tbl2 = os.path.join(tdir2, "hid")
        t0 = time.time()
        M.append_hidden_partitioned(
            big.select("l_orderkey", "l_quantity",
                       (F.col("l_orderkey") % 97).alias("kmod")),
            tbl2, ("trunc", 10_000_000, "l_orderkey"))
        dt_w = time.time() - t0
        lo2 = 20_000_000
        hi2 = lo2 + 9_999_999
        t0 = time.time()
        dfh, kept, total = M.read_hidden_range(spark, tbl2, lo2, hi2)
        nh = dfh.count()
        dt_r = time.time() - t0
        print(f"hidden partitioning (trunc 10M): write {dt_w:.2f}s; "
              f"range read kept {kept}/{total} files, {nh:,} rows "
              f"in {dt_r:.2f}s")

        tbl3 = os.path.join(tdir2, "dv")
        M.append(big.select("l_orderkey", "l_quantity").repartition(32),
                 tbl3)
        t0 = time.time()
        _, ndel = M.delete_where_mor(
            spark, tbl3, "l_orderkey % 10000 = 0")
        dt_d = time.time() - t0
        t0 = time.time()
        nred = M.read_table(spark, tbl3).count()
        dt_rd = time.time() - t0
        print(f"deletion vectors: {ndel:,} rows deleted with ZERO "
              f"rewrites in {dt_d:.2f}s; DV-filtered full read "
              f"{nred:,} rows in {dt_rd:.2f}s")

        # incremental join maintenance: delta run must cost ~delta,
        # not ~history
        from niamoto_spark.operators.incremental import maintain_join

        lp = os.path.join(tdir2, "mj_l")
        rp = os.path.join(tdir2, "mj_r")
        sp = os.path.join(tdir2, "mj_s")
        M.append(big.select("l_orderkey", "l_quantity")
                 .where("l_orderkey % 16 != 0"), lp)
        M.append(big.select(F.col("l_orderkey").alias("l_orderkey"),
                            "l_partkey").distinct(), rp)
        t0 = time.time()
        maintain_join(spark, lp, rp, sp, on="l_orderkey")
        dt_full = time.time() - t0
        M.append(big.select("l_orderkey", "l_quantity")
                 .where("l_orderkey % 16 = 0"), lp)
        t0 = time.time()
        maintain_join(spark, lp, rp, sp, on="l_orderkey")
        dt_delta = time.time() - t0
        print(f"maintain_join: initial {dt_full:.2f}s, 1/16-delta "
              f"run {dt_delta:.2f}s ({dt_full / max(dt_delta, 1e-9):.1f}x "
              f"cheaper than refit)")
    finally:
        shutil.rmtree(tdir2, ignore_errors=True)

    from niamoto_spark.operators.trees import stump_split

    t0 = time.time()
    stump_split(big.withColumn("y", (F.col("l_orderkey") % 2)
                               .cast("int")),
                ["l_quantity", "l_extendedprice", "l_discount"],
                "y", n_bins=32).collect()
    dt = time.time() - t0
    print(f"stump_split (1 Expand + (feature,bin) agg): {dt:.2f}s "
          f"({n / dt / 1e6:.1f}M rows/s)")

    # ---- round-8 operators ------------------------------------------------
    from niamoto_spark.operators.sketches import bitmap_distinct_rollup
    from niamoto_spark.operators.timeseries import (counter_rate,
                                                    ohlc_bars,
                                                    state_periods,
                                                    time_weighted_avg)

    t0 = time.time()
    time_weighted_avg(bev, "user_id", "ts_sec", "value",
                      "event_id").count()
    dt = time.time() - t0
    print(f"time_weighted_avg (1 window + 1 agg): {dt:.2f}s "
          f"({ne / dt / 1e6:.1f}M rows/s)")

    t0 = time.time()
    ohlc_bars(bev, "event_type", "ts_sec", "value", "event_id",
              granule_s=3600).count()
    dt = time.time() - t0
    print(f"ohlc_bars (map-side min_by/max_by, no window): {dt:.2f}s "
          f"({ne / dt / 1e6:.1f}M rows/s)")

    t0 = time.time()
    state_periods(bev, "user_id", "ts_sec", "event_type",
                  "event_id").count()
    dt = time.time() - t0
    print(f"state_periods (islands, 1 sort): {dt:.2f}s "
          f"({ne / dt / 1e6:.1f}M rows/s)")

    t0 = time.time()
    counter_rate(bev, "user_id", "ts_sec", "value", "event_id").count()
    dt = time.time() - t0
    print(f"counter_rate (lag + agg): {dt:.2f}s "
          f"({ne / dt / 1e6:.1f}M rows/s)")

    t0 = time.time()
    bitmap_distinct_rollup(bev, "event_type", "user_id").count()
    dt_bm = time.time() - t0
    t0 = time.time()
    bev.groupBy("event_type").agg(
        F.count_distinct("user_id")).count()
    bev.agg(F.count_distinct("user_id")).count()
    dt_cd = time.time() - t0
    print(f"bitmap_distinct per-group+total: {dt_bm:.2f}s vs "
          f"count_distinct twice: {dt_cd:.2f}s "
          f"({dt_cd / max(dt_bm, 1e-9):.1f}x from bitmap reuse)")

    # Adamic-Adar stays bounded: supplier co-order graph at 16x facts
    from niamoto_spark.operators.graph import adamic_adar

    t0 = time.time()
    npairs = adamic_adar(
        big.select(F.col("l_suppkey").alias("item"),
                   F.col("l_orderkey").alias("grp")),
        "item", "grp").count()
    dt = time.time() - t0
    print(f"adamic_adar ({npairs:,} pairs from {n:,} memberships): "
          f"{dt:.2f}s ({n / dt / 1e6:.1f}M rows/s)")

    # DV-carry read tax: after the round-8 fix an append on a
    # DV-carrying table keeps the vectors; the read must still be
    # ~full-scan speed (broadcast anti join on the tiny DV set).
    import shutil as _sh
    import tempfile as _tf

    tdir3 = _tf.mkdtemp(prefix="probe_dvcarry_")
    try:
        tbl4 = os.path.join(tdir3, "t")
        M.append(big.select("l_orderkey", "l_quantity")
                 .repartition(32), tbl4)
        M.delete_where_mor(spark, tbl4, "l_orderkey % 50000 = 0")
        M.append(big.select("l_orderkey", "l_quantity").limit(1000),
                 tbl4)                       # carries the DV forward
        t0 = time.time()
        n_clean = M.read_table(spark, tbl4).count()
        dt_dv = time.time() - t0
        t0 = time.time()
        spark.read.parquet(
            *M._read_manifest(tbl4, M.committed_version(tbl4))["files"]
        ).count()
        dt_raw = time.time() - t0
        print(f"DV carried across append: read {n_clean:,} rows in "
              f"{dt_dv:.2f}s vs raw scan {dt_raw:.2f}s "
              f"({dt_dv / max(dt_raw, 1e-9):.2f}x tax)")
    finally:
        _sh.rmtree(tdir3, ignore_errors=True)

    # Round 9: minhash at an inflated corpus.  The fan_out byte-floor
    # change (min_bytes=0 for interpreted-HOF lanes) must be a NO-OP
    # once the source already has partitions >= parallelism/4 — verify
    # the partition count is untouched, then time the full candidate
    # pipeline to put a docs/sec number behind the spread lane.
    from niamoto_spark.functions import fan_out
    from niamoto_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    dpieces = [docs.withColumn("doc_id",
                               F.col("doc_id") + F.lit(i * 1_000_000))
               for i in range(mult)]
    bigd = dpieces[0]
    for piece in dpieces[1:]:
        bigd = bigd.unionByName(piece)
    # Write the inflated corpus as a MULTI-FILE parquet source so the
    # no-op property is tested on what fan_out actually inspects (its
    # partition estimate comes from the source FILES, not the runtime
    # partitioning): with >= parallelism/4 files, fan_out must return
    # the input unchanged.  The previous assert compared against a
    # hardcoded 32 and passed only where defaultParallelism == 32.
    import shutil as _sh2
    import tempfile as _tf2

    ddir = _tf2.mkdtemp(prefix="probe_docs_")
    try:
        bigd.repartition(64).write.mode("overwrite").parquet(ddir)
        wide = spark.read.parquet(ddir)
        ndocs = wide.count()
        target = spark.sparkContext.defaultParallelism
        if 64 * 4 > target:                  # fan_out's no-op condition
            before = wide.rdd.getNumPartitions()
            after = fan_out(wide, min_bytes=0).rdd.getNumPartitions()
            assert after == before, \
                f"fan_out must leave a wide source alone ({before}->{after})"
            print(f"# fan_out no-op on {before}-partition source: OK")
        t0 = time.time()
        npairs2 = minhash_lsh_candidates(wide, "doc_id", "text").count()
        dt = time.time() - t0
        print(f"minhash_lsh_candidates ({ndocs:,} docs -> {npairs2:,} "
              f"pairs): {dt:.2f}s ({ndocs / dt / 1e3:.1f}K docs/s)")
    finally:
        _sh2.rmtree(ddir, ignore_errors=True)


def _guard_lanes(spark, sf: str, mult: int,
                 only: "list[str] | None" = None) -> "dict[str, tuple]":
    """Run the guard lane set at one multiplier; returns
    {lane: (rows, seconds)}."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    part = spark.read.parquet(f"{sf}/part.parquet")
    pieces = [li.withColumn("l_orderkey",
                            F.col("l_orderkey") + F.lit(i * 10_000_000))
              for i in range(mult)]
    big = pieces[0]
    for p in pieces[1:]:
        big = big.unionByName(p)
    big = big.repartition(32).cache()
    n = big.count()
    px, d = F.col("l_extendedprice"), F.col("l_discount")
    lanes = {
        "pricing_agg": big.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.sum(px), F.sum(px * (1 - d)),
            F.avg("l_quantity"), F.count(F.lit(1))),
        "broadcast_topk": (
            big.join(F.broadcast(part), big.l_partkey == part.p_partkey)
            .groupBy("p_brand").count()
            .orderBy(F.col("count").desc(), "p_brand").limit(10)),
        "median_per_group": big.groupBy("l_returnflag").agg(
            F.median("l_quantity")),
        "hash_dedup": (big.select(
            F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber"))
            .alias("k")).groupBy("k").count()),
    }
    out = {}
    for label, df in lanes.items():
        if only is not None and label not in only:
            continue
        t0 = time.time()
        df.count()
        out[label] = (n, round(time.time() - t0, 3))
    big.unpersist()
    return out


def _guard_lanes_llm(spark, sf: str, mult: int,
                     only: "list[str] | None" = None) -> "dict[str, tuple]":
    """The flagship LLM-pipeline scale operators (VERDICT r10 next-#6):
    minhash-LSH candidates, interval join, sequence packing, and
    minhash-prefiltered TF-IDF cosine — each must stay near-linear; a
    superlinear blowup here is exactly the all-pairs/self-join class
    the bounded designs exist to prevent."""
    from pyspark.sql import types as T

    from niamoto_spark.operators.dedup import (minhash_lsh_candidates,
                                               simhash_near_pairs)
    from niamoto_spark.operators.interval import interval_join
    from niamoto_spark.operators.similarity import (cosine_topk_blas,
                                                    embedding_near_dup)
    from niamoto_spark.operators.text import pack_sequences
    from niamoto_spark.operators.tfidf import tfidf_cosine_pairs

    docs = spark.read.parquet(f"{sf}/documents.parquet").where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    # Inflate with a per-copy SALT token woven between every word:
    # verbatim copies would be true cross-copy near-duplicates, and the
    # candidate-pair count would grow quadratically in the multiplier —
    # real work, not a plan regression, which would always trip the
    # guard.  The salt lands in every shingle, so cross-copy Jaccard
    # drops to ~0 while each copy's own planted duplicates remain.
    dpieces = [docs.withColumn("doc_id",
                               F.col("doc_id") + F.lit(i * 1_000_000))
               .withColumn("text", F.regexp_replace(
                   "text", " ", f" z{i} "))
               for i in range(mult)]
    bigd = dpieces[0]
    for p in dpieces[1:]:
        bigd = bigd.unionByName(p)
    bigd = bigd.repartition(32).cache()
    ndocs = bigd.count()

    ev = spark.read.parquet(f"{sf}/events.parquet")
    ts_sec = (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000) \
        .cast("long") if isinstance(ev.schema["ts"].dataType,
                                    (T.TimestampType, T.TimestampNTZType)) \
        else (F.col("ts") / 1_000_000_000).cast("long")
    epieces = [ev.withColumn("event_id",
                             F.col("event_id") + F.lit(i * 10_000_000))
               .withColumn("user_id", F.col("user_id") + F.lit(i * 1000))
               for i in range(mult)]
    bev = epieces[0]
    for p in epieces[1:]:
        bev = bev.unionByName(p)
    bev = bev.withColumn("ts_sec", ts_sec).repartition(32).cache()
    nev = bev.count()

    purchases = bev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts_sec").alias("ws"), (F.col("ts_sec") + 1800).alias("we"))
    clicks = bev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts_sec").alias("cts"))

    # embeddings (unit-norm, dim 64): each copy gets a deterministic
    # per-vector pseudo-noise rotation (JVM-side sin keyed on element
    # index, copy index AND vec_id — no UDF) of norm ~0.57, capping the
    # SAME base vector's cross-copy cosine at ~0.75 — well under the
    # 0.95 near-dup threshold, so the pair count can't grow
    # mult-quadratically (measured: cross-copy sits at ~0.75; at a 0.6
    # threshold it WOULD go quadratic — 504/3010 pairs at mult 2/4).
    # Every 20th vector in each copy gets a tiny-noise TWIN (+500k id
    # offset), so the TRUE pair set is ~n/20 per copy: linear in mult,
    # and the lane verifies real matches rather than an empty result.
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").where(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())

    def _perturb(c: float, amp: float = 0.1):
        return lambda x, j: x + F.lit(amp) * F.sin(
            (j.cast("double") + F.lit(1.0)) * F.lit(c)
            + F.col("vec_id").cast("double"))

    qpieces = []
    for i in range(mult):
        piece = (
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
               .withColumn("embedding",
                           F.transform("embedding", _perturb(float(i + 1)))))
        twins = (piece.where(F.pmod(F.col("vec_id"), F.lit(20)) == 0)
                 .withColumn("vec_id", F.col("vec_id") + F.lit(500_000))
                 .withColumn("embedding",
                             F.transform("embedding", _perturb(7.0, 0.01))))
        qpieces += [piece, twins]
    bige = qpieces[0]
    for p in qpieces[1:]:
        bige = bige.unionByName(p)
    bige = bige.repartition(32).cache()
    nemb = bige.count()
    emb_queries = emb.limit(64)

    lanes = {
        "minhash_lsh_candidates":
            (ndocs, lambda: minhash_lsh_candidates(
                bigd, "doc_id", "text").count()),
        # r13: the ids-only band-shuffle strategy measured head-to-head
        # with the bucket path — at cluster scale its ~3x signature
        # amplification (vs bands~16x) is the design win; this lane
        # checks the local-mode cost of the extra joins stays linear.
        "minhash_lsh_join":
            (ndocs, lambda: minhash_lsh_candidates(
                bigd, "doc_id", "text", pair_strategy="join").count()),
        "interval_join":
            (nev, lambda: interval_join(
                clicks, purchases, on="user_id", point_ts="cts",
                start_col="ws", end_col="we", granule_s=3600).count()),
        "sequence_packing":
            (ndocs, lambda: pack_sequences(
                bigd, "doc_id", "text", seq_len=2048).count()),
        "tfidf_prefiltered":
            (ndocs, lambda: tfidf_cosine_pairs(
                bigd, "doc_id", "text", threshold=0.3, max_df_frac=0.5,
                prefilter="minhash").count()),
        # r14: simhash pairs.  SimHash bits correlate on template-heavy
        # corpora, so UNCAPPED pigeonhole banding is quadratic (the
        # first run of this lane measured sum(bucket²) x122 for x16
        # rows and OOM'd at 64x — the guard working as designed); the
        # scale path runs with the hot-bucket cap, same contract as
        # the minhash lanes.
        "simhash_pairs":
            (ndocs, lambda: simhash_near_pairs(
                bigd, "doc_id", "text", max_bucket_size=256).count()),
        # r14: ANN lanes over the embeddings table.  cosine_topk_blas is
        # the brute-force scale path (broadcast queries, corpus never
        # shuffles — cost linear in corpus rows).  embedding_near_dup's
        # ball-cover verification is ~n^1.5: each copy's vectors are
        # deterministically perturbed per copy index so cross-copy
        # cosine falls below threshold and the TRUE pair set stays
        # per-copy (quadratic pair growth would be real work, masking a
        # plan regression, same salt doctrine as the text lanes).
        "ann_blas_topk":
            (nemb, lambda: cosine_topk_blas(
                bige, emb_queries, "vec_id", "embedding", k=10).count()),
        # exact ball-cover is ~n^1.5 by design (verification work) —
        # recorded to 16x; the hyperplane-LSH variant is the linear
        # 100 TB path and carries the 64x record.
        "embedding_near_dup":
            (nemb, lambda: embedding_near_dup(
                bige, "vec_id", "embedding", threshold=0.95).count()),
        "embedding_near_dup_lsh":
            (nemb, lambda: embedding_near_dup(
                bige, "vec_id", "embedding", threshold=0.95,
                method="lsh", max_bucket_size=256).count()),
        # r15: the UNSPECIFIED-cap path — max_bucket_size now defaults
        # to 1000 (verdict r14 Wrong #3), so a caller who never heard
        # of hot buckets gets bounded banding; this lane probes exactly
        # that default call.  Kept separate from the =256 lane so its
        # historical records stay comparable.
        "embedding_near_dup_lsh_default":
            (nemb, lambda: embedding_near_dup(
                bige, "vec_id", "embedding", threshold=0.95,
                method="lsh").count()),
    }
    out = {}
    for label, (rows, run) in lanes.items():
        if only is not None and label not in only:
            continue
        t0 = time.time()
        run()
        out[label] = (rows, round(time.time() - t0, 3))
    bigd.unpersist()
    bev.unpersist()
    bige.unpersist()
    return out


def guard(multipliers: "list[int]" = (1, 4, 16),
          jsonl_path: str | None = None,
          max_cost_growth: float = 2.0,
          llm: bool = False,
          lanes: "list[str] | None" = None) -> int:
    """VERDICT r9 next-#7: structured scale records + a superlinear
    wall-time flag.  Runs the guard lanes at each multiplier, appends
    one JSONL record per (multiplier, lane) to SCALE_PROBE.jsonl, and
    FAILS if any lane's per-row cost grows more than
    ``max_cost_growth``x between adjacent scales (the early DV-tax
    regression — 10.45x raw-scan tax — would have tripped this
    automatically)."""
    import json

    from niamoto_spark.session import get_spark

    spark = get_spark("scale_probe_guard")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    jsonl_path = jsonl_path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.jsonl")
    _build = _guard_lanes_llm if llm else _guard_lanes

    def build(spark_, sf_, mult_):
        # --lanes=a,b scopes a big-multiplier run to the lanes under
        # question (r14: the 256x join-lane record) without paying for
        # the whole set at that scale — unlisted lanes never execute
        return _build(spark_, sf_, mult_, only=lanes)
    build(spark, sf, 1)          # warm-up: JVM/codegen cold-start must
    #                              not inflate the smallest scale's
    #                              baseline (that would mask regressions)
    results: dict[int, dict] = {}
    for m in multipliers:
        results[m] = build(spark, sf, m)
        print(f"# mult {m}: " + ", ".join(
            f"{k}={v[1]}s" for k, v in results[m].items()))
    with open(jsonl_path, "a") as f:
        for m in multipliers:
            for lane, (rows, sec) in results[m].items():
                f.write(json.dumps({
                    "sf_dir": sf, "multiplier": m, "lane": lane,
                    "rows": rows, "seconds": sec,
                    "rows_per_sec": round(rows / max(sec, 1e-9))}) + "\n")
    flags = []
    ms = sorted(multipliers)
    for lo, hi in zip(ms, ms[1:]):
        for lane in results[lo]:
            r0, s0 = results[lo][lane]
            r1, s1 = results[hi][lane]
            cost0, cost1 = s0 / r0, s1 / r1
            growth = cost1 / cost0 if cost0 > 0 else 1.0
            line = (f"{lane}: per-row cost x{growth:.2f} from "
                    f"mult {lo} -> {hi}")
            if growth > max_cost_growth:
                flags.append("FLAG " + line)
            else:
                print("ok   " + line)
    for fl in flags:
        print(fl)
    if flags:
        print(f"\n{len(flags)} lane(s) exceed {max_cost_growth}x "
              "per-row cost growth")
        return 1
    print("\nall lanes within the per-row cost growth bound")
    return 0


if __name__ == "__main__":
    if "--guard" in sys.argv:
        mults = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 4, 16]
        lanes = None
        for a in sys.argv[1:]:
            if a.startswith("--lanes="):
                lanes = a.split("=", 1)[1].split(",")
        raise SystemExit(guard(mults, llm="--llm" in sys.argv,
                               lanes=lanes))
    main()
