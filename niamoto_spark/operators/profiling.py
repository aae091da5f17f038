"""Column profiling — one-job data-quality summary of any table.

The reference computes per-field summaries one SQL query at a time inside
its transformer plugins (statistical_summary, field_aggregator —
core/plugins/transformers/aggregation/statistical_summary.py); this
operator profiles EVERY column in a single aggregate job: the driver
builds one wide agg (Catalyst evaluates all column expressions in one
pass over the data, count_distincts share one Expand), then reshapes the
single result row into one output row per column with ``stack`` — no
per-column jobs, no driver-side loop over queries.

Scale: exact ``count_distinct`` per column multiplies the shuffle by the
number of profiled columns (Expand).  ``approx=True`` switches to
HyperLogLog++ ``approx_count_distinct`` — one ordinary partial agg, the
100 TB default; the exact mode stays for oracle-checked runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal", "long")


@register("profile_table", PluginType.TRANSFORMER)
def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False, round_dp: int = 4) -> DataFrame:
    """One row per column: (col_name, dtype, n_rows, n_nulls, n_distinct,
    num_min, num_max, num_avg, len_min, len_max) — numeric stats null for
    non-numeric columns, length stats null for non-strings."""
    dtypes = dict(df.dtypes)
    cols = columns or list(df.columns)
    cd = F.approx_count_distinct if approx else F.count_distinct

    aggs, n_rows = [], F.count(F.lit(1)).alias("__n")
    for c in cols:
        t = dtypes[c]
        is_num = any(t.startswith(p) for p in _NUMERIC)
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            cd(c).alias(f"{c}__nd"),
            (F.round(F.min(F.col(c).cast("double")), round_dp) if is_num
             else F.lit(None).cast("double")).alias(f"{c}__mn"),
            (F.round(F.max(F.col(c).cast("double")), round_dp) if is_num
             else F.lit(None).cast("double")).alias(f"{c}__mx"),
            (F.round(F.avg(F.col(c).cast("double")), round_dp) if is_num
             else F.lit(None).cast("double")).alias(f"{c}__av"),
            (F.min(F.length(c)) if t == "string"
             else F.lit(None).cast("int")).alias(f"{c}__lmn"),
            (F.max(F.length(c)) if t == "string"
             else F.lit(None).cast("int")).alias(f"{c}__lmx"),
        ]
    wide = df.agg(n_rows, *aggs)

    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'", f"'{dtypes[c]}'", f"`{c}__nn`", f"`{c}__nd`",
            f"`{c}__mn`", f"`{c}__mx`", f"`{c}__av`", f"`{c}__lmn`",
            f"`{c}__lmx`"]
    stack = (f"stack({len(cols)}, {', '.join(stack_args)}) as "
             "(col_name, dtype, n_nulls, n_distinct, num_min, num_max, "
             "num_avg, len_min, len_max)")
    return wide.select(F.col("__n").alias("n_rows"), F.expr(stack)) \
               .select("col_name", "dtype", "n_rows", "n_nulls",
                       "n_distinct", "num_min", "num_max", "num_avg",
                       "len_min", "len_max")
