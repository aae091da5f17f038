"""Lakehouse-layer walkthrough on the manifest table format.

Exercises the table-format features end-to-end the way a data-platform
team would run a day of operations:

  1. ingest orders hidden-partitioned by bucket(o_custkey)
  2. constraint-gated append of a second batch (append_checked)
  3. merge-on-read DELETE via deletion vectors (zero rewrites)
  4. Write-Audit-Publish: poisoned batch staged, audited, abandoned;
     clean batch published atomically
  5. compact (materializes the DVs) + vacuum-safe RESTORE check
  6. shallow clone for a dev sandbox; diverges independently
  7. incremental aggregate maintenance fed by CDC
  8. version-keyed result cache: hit until the next commit
  9. time-travel audit: every historical version still readable

Run:  python examples/lakehouse_demo.py [sf_dir] [work_dir]
Defaults: /root/testdata/sf0.001  /tmp/niamoto_lakehouse_demo
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(sf_dir: str, work_dir: str, spark=None) -> dict:
    from niamoto_spark.operators.incremental import (maintain_aggregate,
                                                     read_aggregate)
    from niamoto_spark.operators.quality import expect
    from niamoto_spark.resultcache import cached_query
    from niamoto_spark.session import get_spark
    from niamoto_spark.sources import manifest as M

    spark = spark or get_spark("lakehouse_demo")
    if os.path.exists(work_dir):
        shutil.rmtree(work_dir)
    tbl = os.path.join(work_dir, "orders")
    agg = os.path.join(work_dir, "rev_by_prio")
    clone = os.path.join(work_dir, "orders_dev")
    cache = os.path.join(work_dir, "cache")
    report: dict = {}

    o = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
         .select("o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderpriority"))

    # 1. hidden-partitioned ingest: point lookups prune to one bucket
    M.append_hidden_partitioned(
        o.where(F.col("o_orderkey") % 2 == 0), tbl,
        ("bucket", 8, "o_custkey"))
    probe = o.select("o_custkey").first()[0]
    _, kept, total = M.read_hidden_point(spark, tbl, probe)
    report["point_read_files"] = (kept, total)

    # 2. constraint-gated append (bad batches can never commit)
    M.append_checked(
        o.where(F.col("o_orderkey") % 2 == 1), tbl,
        rules=[{"rule": "not_null", "col": "o_orderkey"},
               {"rule": "in_range", "col": "o_totalprice",
                "lo": 0.0, "hi": 1e9}])
    report["rows_after_ingest"] = M.read_table(spark, tbl).count()

    # 3. merge-on-read DELETE: no data file rewritten
    files_before = set(M._read_manifest(
        tbl, M.committed_version(tbl))["files"])
    _, n_del = M.delete_where_mor(spark, tbl, "o_totalprice < 10000")
    files_after = set(M._read_manifest(
        tbl, M.committed_version(tbl))["files"])
    report["dv_deleted"] = n_del
    report["dv_zero_rewrite"] = files_before == files_after

    # 4. compact materializes the vectors; history stays readable
    M.compact(spark, tbl, target_files=4)
    report["rows_after_delete"] = M.read_table(spark, tbl).count()

    # 5. WAP: poison fails its audit and never becomes visible
    poison = o.limit(50).withColumn("o_totalprice",
                                    -F.col("o_totalprice"))
    M.wap_stage(poison, tbl, "nightly")
    bad = (expect(M.read_branch(spark, tbl, "nightly"),
                  [{"rule": "in_range", "col": "o_totalprice",
                    "lo": 0.0, "hi": 1e9}])
           .agg(F.sum("n_violations")).first()[0])
    assert bad and bad > 0
    M.wap_abandon(tbl, "nightly")
    clean = (o.limit(50)
             .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000))
    M.wap_stage(clean, tbl, "nightly")
    ok = (expect(M.read_branch(spark, tbl, "nightly"),
                 [{"rule": "in_range", "col": "o_totalprice",
                   "lo": 0.0, "hi": 1e9}])
          .agg(F.sum("n_violations")).first()[0])
    assert not ok
    M.wap_publish(tbl, "nightly")
    report["rows_after_wap"] = M.read_table(spark, tbl).count()

    # 6. dev sandbox: zero-copy clone, diverges without touching prod
    M.shallow_clone(tbl, clone)
    M.append(clean.limit(5), clone)
    report["clone_independent"] = (
        M.read_table(spark, clone).count()
        == M.read_table(spark, tbl).count() + 5)

    # 7. incremental aggregate maintenance over CDC
    maintain_aggregate(spark, tbl, agg, ["o_orderpriority"],
                       [("sum", "o_totalprice"), ("count", "o_orderkey")])
    report["agg_groups"] = read_aggregate(spark, agg).count()

    # 8. result cache: second call is a metadata-read hit
    def build():
        return (M.read_table(spark, tbl).groupBy("o_orderpriority")
                .agg(F.sum("o_totalprice").alias("rev")))
    _, h1 = cached_query(spark, cache, "rev", [tbl], build)
    _, h2 = cached_query(spark, cache, "rev", [tbl], build)
    report["cache_hits"] = (h1, h2)

    # 9. every version still time-travels
    head = M.committed_version(tbl)
    readable = all(
        M.read_table(spark, tbl, version=v).limit(1).count() >= 0
        for v in range(head + 1))
    report["history_readable"] = readable
    report["n_versions"] = head + 1
    return report


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/niamoto_lakehouse_demo"
    print(run(sf, out))
