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


if __name__ == "__main__":
    main()
