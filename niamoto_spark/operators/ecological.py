"""Ecological / array math (SURVEY §2.3 "custom_calculator": 15 operations,
reference transformers/ecological/custom_calculator.py:64-82, dispatch
:405-470).

Two forms are provided:
- **Aggregation form** (preferred at scale): diversity indices computed
  directly from a counts table with one hash aggregate — e.g. Shannon over
  ``groupBy(group).pivot-free`` count rows.
- **Array form**: the reference's per-entity arrays are ArrayType columns;
  operations use higher-order functions (transform/aggregate/zip_with), all
  JVM-side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


# --------------------------------------------------------------------------
# Diversity indices as aggregations over count tables
# --------------------------------------------------------------------------

def shannon_pielou(counts: DataFrame, group_cols: Sequence[str],
                   count_col: str = "count") -> DataFrame:
    """Shannon H (log2, zeros ignored) and Pielou evenness from a long table
    of per-category counts.

    Parity (reference custom_calculator.py:712-805): probabilities are
    count/total over NONZERO classes; H = -sum(p*log2 p);
    max_entropy = log2(#nonzero classes); Pielou = H / max_entropy.
    Output: group_cols + (shannon, max_entropy, classes_count,
    non_zero_classes, pielou).
    One aggregate over the counts table -> scales with distinct categories,
    not raw rows.
    """
    c = F.col(count_col).cast("double")
    nz = F.sum(F.when(c > 0, 1).otherwise(0))
    total = F.sum(F.when(c > 0, c).otherwise(F.lit(0.0)))
    g = counts.groupBy(*group_cols) if group_cols else counts.groupBy()
    pre = g.agg(
        F.count(F.lit(1)).alias("classes_count"),
        nz.alias("non_zero_classes"),
        total.alias("__total"),
        F.sum(F.when(c > 0, c * F.log2(c))).alias("__sum_clog2c"),
    )
    # H = log2(T) - (1/T) * sum(c*log2 c)  (algebraic form avoids a second pass)
    h = F.when(
        F.col("__total") > 0,
        F.log2(F.col("__total")) - F.col("__sum_clog2c") / F.col("__total"),
    ).otherwise(F.lit(0.0))
    out = pre.withColumn("shannon", F.round(h, 4)) \
             .withColumn("max_entropy",
                         F.when(F.col("non_zero_classes") > 0,
                                F.round(F.log2(F.col("non_zero_classes").cast("double")), 4))
                          .otherwise(F.lit(0.0))) \
             .withColumn("pielou",
                         F.when(F.col("max_entropy") > 0,
                                F.round(F.col("shannon") / F.col("max_entropy"), 4))
                          .otherwise(F.lit(0.0)))
    return out.select(*group_cols, "shannon", "max_entropy", "classes_count",
                      "non_zero_classes", "pielou")


def simpson_index(counts: DataFrame, group_cols: Sequence[str],
                  count_col: str = "count") -> DataFrame:
    """Simpson diversity 1 - sum(p^2) from a counts table."""
    c = F.col(count_col).cast("double")
    g = counts.groupBy(*group_cols) if group_cols else counts.groupBy()
    pre = g.agg(F.sum(c).alias("__t"), F.sum(c * c).alias("__ss"))
    return pre.select(
        *group_cols,
        F.round(F.lit(1.0) - F.col("__ss") / (F.col("__t") * F.col("__t")), 4)
         .alias("simpson"))


# --------------------------------------------------------------------------
# Array-form operations (ArrayType columns, higher-order functions)
# --------------------------------------------------------------------------

def _arr(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def array_division(a, b) -> Column:
    return F.zip_with(_arr(a), _arr(b),
                      lambda x, y: F.when(y != 0, x.cast("double") / y).otherwise(F.lit(0.0)))


def array_multiplication(a, b) -> Column:
    return F.zip_with(_arr(a), _arr(b), lambda x, y: x.cast("double") * y)


def array_sum(a) -> Column:
    return F.aggregate(_arr(a), F.lit(0.0), lambda acc, v: acc + v.cast("double"))


def normalize_array(a) -> Column:
    """Scale array to sum 1 (zeros stay zero when total==0)."""
    total = array_sum(a)
    return F.transform(_arr(a),
                       lambda v: F.when(total != 0, v.cast("double") / total)
                                  .otherwise(F.lit(0.0)))


def weighted_sum(values, weights) -> Column:
    return array_sum(array_multiplication(values, weights))


def sum_array_slice(a, start: int, length: int) -> Column:
    return array_sum(F.slice(_arr(a), start + 1, length))  # 0-based start


def ratio_calculation(num, den) -> Column:
    n, d = _arr(num), _arr(den)
    return F.when(d != 0, n.cast("double") / d).otherwise(F.lit(None))


def shannon_entropy_array(a) -> Column:
    """Shannon H (log2) of a count/abundance array; zeros ignored
    (custom_calculator.py:712-763)."""
    total = F.aggregate(_arr(a), F.lit(0.0),
                        lambda acc, v: acc + F.when(v > 0, v.cast("double")).otherwise(F.lit(0.0)))
    term = F.aggregate(
        _arr(a), F.lit(0.0),
        lambda acc, v: acc + F.when(v > 0, v.cast("double") * F.log2(v.cast("double")))
                             .otherwise(F.lit(0.0)))
    return F.when(total > 0, F.log2(total) - term / total).otherwise(F.lit(0.0))


def pielou_evenness_array(a) -> Column:
    nonzero = F.size(F.filter(_arr(a), lambda v: v > 0))
    h = shannon_entropy_array(a)
    return F.when(nonzero > 1, h / F.log2(nonzero.cast("double"))).otherwise(F.lit(0.0))


def peak_detection(a, threshold_ratio: float = 0.5) -> Column:
    """Indices (1-based) where the value exceeds threshold_ratio * max —
    the phenology chain's peak op (custom_calculator dispatch :405-470;
    transform.yml:134-176)."""
    arr = _arr(a)
    mx = F.array_max(arr)
    return F.filter(
        F.transform(arr, lambda v, i: F.when(v >= mx * threshold_ratio, i + 1)),
        lambda x: x.isNotNull())


def active_periods(a, threshold: float = 0.0) -> Column:
    """1-based indices with activity above threshold (phenology)."""
    return F.filter(
        F.transform(_arr(a), lambda v, i: F.when(v > threshold, i + 1)),
        lambda x: x.isNotNull())


@register("custom_calculator", PluginType.TRANSFORMER)
def custom_calculator(df: DataFrame, operation: str, **kwargs) -> DataFrame:
    """Dispatch mirroring the reference's Operation enum
    (custom_calculator.py:64-82).  Column-level ops append an ``out`` column.
    """
    ops = {
        "array_division": lambda: array_division(kwargs["a"], kwargs["b"]),
        "array_multiplication": lambda: array_multiplication(kwargs["a"], kwargs["b"]),
        "normalize_array": lambda: normalize_array(kwargs["a"]),
        "weighted_sum": lambda: weighted_sum(kwargs["values"], kwargs["weights"]),
        "shannon_entropy": lambda: shannon_entropy_array(kwargs["a"]),
        "pielou_evenness": lambda: pielou_evenness_array(kwargs["a"]),
        "sum_array_slice": lambda: sum_array_slice(kwargs["a"], kwargs["start"], kwargs["length"]),
        "ratio_calculation": lambda: ratio_calculation(kwargs["num"], kwargs["den"]),
        "peak_detection": lambda: peak_detection(kwargs["a"], kwargs.get("threshold_ratio", 0.5)),
        "active_periods": lambda: active_periods(kwargs["a"], kwargs.get("threshold", 0.0)),
    }
    if operation not in ops:
        raise ValueError(f"unsupported operation {operation!r}; known {sorted(ops)}")
    return df.withColumn(kwargs.get("out", "out"), ops[operation]())
