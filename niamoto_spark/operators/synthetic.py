"""Deterministic synthetic data generation — the dbgen-shaped source.

Test fixtures, load benchmarks and privacy-safe demo datasets all need
synthetic tables; what makes one USEFUL at engine scale is (a) it
generates distributively (spark.range partitions, no driver list) and
(b) the values are a pure function of (seed, id), so the same table
reproduces on any engine, any partitioning, any run — the md5-uniform
discipline the sampling/splitting lane already uses, extended to
shaped distributions:

- uniform u in [0,1): (md5-bucket + 0.5) / 2^32
- standard normal: Box–Muller sqrt(−2 ln u1)·cos(2π u2)
- exponential(λ): −ln(u)/λ (inverse CDF)
- weighted categorical: u against ascending cumulative weights

Everything is closed-form float64 over md5 — an external SQL engine
replays the whole table expression-for-expression (the q322 oracle
does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

_TWO_PI = 6.283185307179586


def _uniform(seed: str, tag: str, id_col) -> "F.Column":
    """Engine-independent uniform in [0,1): md5(seed|tag|id) first 8
    hex digits, centered (+0.5 keeps it strictly inside (0,1), so
    log(u) is always finite)."""
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.lit(tag),
                                      id_col.cast("string"))), 1, 8),
        16, 10).cast("bigint")
    return (bucket + 0.5) / F.lit(float(2 ** 32))


@register("generate_rows", PluginType.TRANSFORMER)
def generate_rows(spark: SparkSession, n: int,
                  categories: "dict[str, float]",
                  exp_lambda: float = 1.0,
                  seed: str = "syn") -> DataFrame:
    """A deterministic synthetic table of ``n`` rows:
    (id, category, gauss, expo, u) — weighted categorical, standard
    normal (Box–Muller), exponential(λ) and the raw uniform.

    ``spark.range`` partitions the id space across executors; every
    value derives from md5(seed|tag|id), so the table is identical
    under any parallelism — and replayable by any engine with md5
    (categorical assignment is a first-match chain over ascending
    cumulative weight bounds)."""
    ids = spark.range(int(n))
    u1 = _uniform(seed, "u1", F.col("id"))
    u2 = _uniform(seed, "u2", F.col("id"))
    uc = _uniform(seed, "cat", F.col("id"))
    gauss = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(_TWO_PI) * u2)
    expo = -F.log(u1) / F.lit(float(exp_lambda))
    total = float(sum(categories.values()))
    chain = None
    acc = 0.0
    items = list(categories.items())
    for name, wt in items:
        acc += wt / total
        cond = uc < F.lit(acc)
        chain = F.when(cond, name) if chain is None \
            else chain.when(cond, name)
    chain = chain.otherwise(items[-1][0])   # float-edge safety net
    return ids.select(
        "id", chain.alias("category"),
        gauss.alias("gauss"), expo.alias("expo"), uc.alias("u"))
