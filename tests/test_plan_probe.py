"""Validation of tools/plan_probe.py (VERDICT r11 next-#1).

Two directions, per the probe-validation doctrine:
  * mechanics — run_permutation really flips the conf for the duration
    of the catalog pass (a conf-sensitive probe query diverges from its
    pinned oracle under shuffle7 but not under the session value) and
    restores it afterward;
  * bug-sensitivity — the exact real-world defect this probe exists
    for (the q308 Catalyst LATERAL-decorrelation miscompile on
    implicit-cast correlated equality) is caught by the probe loop when
    the q308 dtype-alignment guard is absent, and passes when present.
"""

import duckdb
from pyspark.sql import functions as F

from tools.plan_probe import PERMUTATIONS, run_permutation

LATERAL = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM {nation} n,
    LATERAL (SELECT c_name, c_acctbal FROM {customer} c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
"""


def test_permutation_conf_applied_and_restored(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)

    def conf_probe(sp, _):
        return sp.createDataFrame(
            [(sp.conf.get(key),)], "shuffle_parts string")

    qs = {"conf_probe": conf_probe}
    oracles = {"conf_probe": f"SELECT '{before}' AS shuffle_parts"}
    con = duckdb.connect()
    # baseline conf matches the pinned oracle -> a permutation that does
    # NOT touch shuffle.partitions stays green...
    assert run_permutation(spark, con, qs, oracles, "", set(),
                           "nocodegen", {}) == []
    # ...while shuffle7 changes the observed value -> probe flags it
    assert run_permutation(spark, con, qs, oracles, "", set(),
                           "shuffle7", {}) == ["conf_probe"]
    assert spark.conf.get(key) == before, "conf must be restored"


def test_probe_catches_lateral_miscompile(spark, tmp_path):
    """Bidirectional: the raw implicit-cast LATERAL (q308 guard
    removed) FAILS the probe under every permutation incl. combo; the
    dtype-aligned form (the guard) passes all of them."""
    spark.createDataFrame(
        [("1", "A"), ("2", "B")], "n_nationkey string, n_name string"
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(1, 1, "c1", 10.0), (2, 1, "c2", 20.0), (3, 1, "c3", 30.0),
         (4, 2, "c4", 5.0), (5, 2, "c5", 50.0), (6, 2, "c6", 15.0)],
        "c_custkey long, c_nationkey long, c_name string, "
        "c_acctbal double").write.parquet(
        str(tmp_path / "customer.parquet"))

    def q_raw(sp, d):
        sp.read.parquet(f"{d}/nation.parquet") \
            .createOrReplaceTempView("pn")
        sp.read.parquet(f"{d}/customer.parquet") \
            .createOrReplaceTempView("pc")
        return sp.sql(LATERAL.format(nation="pn", customer="pc"))

    def q_guarded(sp, d):
        nat = sp.read.parquet(f"{d}/nation.parquet")
        cust = sp.read.parquet(f"{d}/customer.parquet")
        ct = dict(cust.dtypes)["c_nationkey"]
        if dict(nat.dtypes)["n_nationkey"] != ct:
            nat = nat.withColumn("n_nationkey",
                                 F.col("n_nationkey").cast(ct))
        nat.createOrReplaceTempView("pn")
        cust.createOrReplaceTempView("pc")
        return sp.sql(LATERAL.format(nation="pn", customer="pc"))

    con = duckdb.connect()
    for t in ("nation", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{tmp_path}/{t}.parquet/*.parquet'")
    oracle = LATERAL.format(nation="nation", customer="customer")
    qs = {"q_raw": q_raw, "q_guarded": q_guarded}
    oracles = {"q_raw": oracle, "q_guarded": oracle}
    cache: dict = {}
    for perm in PERMUTATIONS:
        fails = run_permutation(spark, con, qs, oracles,
                                str(tmp_path), set(), perm, cache)
        assert fails == ["q_raw"], (
            f"under {perm}: expected exactly the unguarded LATERAL "
            f"to fail, got {fails}")
