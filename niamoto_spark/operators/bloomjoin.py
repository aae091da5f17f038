"""Bloom-filter join pruning: cut the big side of a join BEFORE its
shuffle using a compact bitmap built from the small side's keys.

At 100 TB the dominant join cost is shuffling fact rows whose keys the
dimension side will reject anyway.  A Bloom filter fixes that without a
second shuffle: build an m-bit bitmap from the dim keys (one shuffle-free
JVM aggregation), broadcast it as a LITERAL into the fact scan's filter,
and let the exact join run on the survivors.  False positives only cost
wasted shuffle rows; the follow-up equi-join removes them, so the final
result is EXACT — which is what makes this oracle-checkable against a
plain join (q128).

Spark's runtime row-level filtering does this automatically only for
certain shapes (`spark.sql.optimizer.runtime.bloomFilter.enabled`, and
`bloom_filter_agg` / `might_contain` are internal, not public API); this
operator is the explicit, composable version.

Design notes (all hashing stays JVM-side so build and probe agree):
- positions: ``pmod(xxhash64(key, seed_i), m)`` for k independent seeds;
- build: positions -> ``groupBy(word) .agg(bit_or(1L << bit))`` — a tiny
  aggregation on the DIM side only; the driver assembles <= m/64 longs;
- probe: the bitmap becomes ONE ArrayType literal (not m/64 Literal
  nodes), and the membership test is pure whole-stage-codegen
  expressions: ``element_at(bitmap, word+1) & (1L << bit) != 0``;
- sizing: standard Bloom formulas m = -n·ln(p)/ln(2)^2, k = (m/n)·ln 2.

Reference parity: the reference engine has no Bloom pruning (its joins
are SQLite-side, src/niamoto/core/services/transformer.py); this is an
extension-brief operator for the 100 TB lane.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

_SEED_BASE = 0x9E3779B1  # golden-ratio odd constant; seeds must be
# identical between build and probe, so they are derived, not random.


def _seeds(k: int) -> list[int]:
    return [(_SEED_BASE * (i + 1)) & 0x7FFFFFFF for i in range(k)]


def bloom_params(n_keys: int, fpp: float = 0.01,
                 max_bits: int = 1 << 24) -> tuple[int, int]:
    """(m_bits, k_hashes) for ``n_keys`` expected keys at ``fpp``.

    m is rounded up to a multiple of 64 and capped at ``max_bits``
    (default 16 Mbit = 2 MiB of longs — a literal that small folds into
    codegen and broadcasts with the task binary; past that, fpp degrades
    gracefully rather than the driver OOMing)."""
    n = max(1, n_keys)
    m = int(-n * math.log(max(1e-12, min(fpp, 0.5))) / (math.log(2) ** 2))
    m = min(max(64, (m + 63) // 64 * 64), max_bits)
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def build_bloom(dim: DataFrame, key: str, m_bits: int,
                k_hashes: int) -> list[int]:
    """Aggregate the dim side into an m-bit Bloom bitmap (list of
    m/64 longs).  One JVM aggregation over <= n·k position rows; the
    collect is bounded by m/64 words, never by the key count."""
    seeds = _seeds(k_hashes)
    pos = dim.select(
        F.explode(F.array(*[
            F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(m_bits))
            for s in seeds])).alias("pos"))
    words = (pos
             .select((F.col("pos") / 64).cast("long").alias("word"),
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(pos % 64 AS INT))").alias("bit"))
             .groupBy("word").agg(F.bit_or("bit").alias("bits"))
             .collect())
    bitmap = [0] * (m_bits // 64)
    for row in words:
        bitmap[int(row["word"])] = int(row["bits"])
    return bitmap


def bloom_might_contain(key_col: Column | str, bitmap: list[int],
                        k_hashes: int) -> Column:
    """Pure-expression membership test (stays in whole-stage codegen).

    ``bitmap`` enters the plan as ONE ArrayType literal; each of the k
    probes is element_at + mask.  No UDF, no join, no shuffle."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    m_bits = len(bitmap) * 64
    arr = F.lit(bitmap)
    cond = F.lit(True)
    one = F.lit(1).cast("long")
    for s in _seeds(k_hashes):
        pos = F.pmod(F.xxhash64(c, F.lit(s)), F.lit(m_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        # PySpark's shiftleft wrapper only takes a Python-int shift;
        # call_function reaches the SQL builtin with a Column amount.
        mask = F.call_function("shiftleft", one, (pos % 64).cast("int"))
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prune(fact: DataFrame, dim: DataFrame, fact_key: str,
                dim_key: str, fpp: float = 0.01,
                n_keys: int | None = None) -> DataFrame:
    """Filter ``fact`` to rows whose key MIGHT be in ``dim`` (no false
    negatives; ~fpp false positives).  The filter is a literal-bitmap
    expression, so Catalyst places it at the fact scan — before any
    exchange a later join would need."""
    n = n_keys if n_keys is not None else dim.select(dim_key).distinct().count()
    m, k = bloom_params(n, fpp)
    # xxhash64 is type-sensitive: an int key and a bigint key hash
    # differently, so the dim key is cast to the fact key's exact type.
    fact_type = fact.schema[fact_key].dataType
    keys = dim.select(F.col(dim_key).cast(fact_type).alias("__k"))
    bitmap = build_bloom(keys, "__k", m, k)
    return fact.where(bloom_might_contain(fact_key, bitmap, k))


@register("bloom_semi_join", PluginType.TRANSFORMER)
def bloom_semi_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                    dim_key: str, fpp: float = 0.01) -> DataFrame:
    """Exact LEFT SEMI join with Bloom pre-pruning on the fact side.

    Equivalent to ``fact.join(dim, fact[k]==dim[k], 'left_semi')`` —
    the Bloom stage only shrinks what reaches the join's exchange, the
    semi join then removes false positives, so results are exact."""
    pruned = bloom_prune(fact, dim, fact_key, dim_key, fpp=fpp)
    return pruned.join(dim.select(F.col(dim_key).alias(fact_key)).distinct(),
                       on=fact_key, how="left_semi")
