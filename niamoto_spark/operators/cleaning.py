"""Missing-value imputation — the data-cleaning staple the reference
handles ad hoc per plugin (each transformer guards nulls its own way,
e.g. statistical_summary's dropna); this operator centralizes it.

One window pass per strategy (the group statistic and the fill are the
same partitioning, no join), all inside whole-stage codegen.  Global
(ungrouped) imputation uses a single-row aggregate broadcast rather
than a partition-less window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

_STRATS = ("mean", "median", "constant")


@register("impute", PluginType.TRANSFORMER)
def impute(df: DataFrame, value_col: str, strategy: str = "mean",
           group_cols: list[str] | None = None,
           fill_value: float | None = None,
           out_col: str | None = None,
           flag_col: str | None = None) -> DataFrame:
    """Replace nulls in ``value_col`` with the group statistic.

    strategy: 'mean' | 'median' (exact, reference parity) | 'constant'
    (uses ``fill_value``).  ``group_cols=None`` -> global statistic.
    ``flag_col`` optionally records which rows were imputed.  Groups
    that are entirely null stay null (no global fallback — explicit is
    better than a silent mixed strategy).
    """
    if strategy not in _STRATS:
        raise ValueError(f"strategy must be one of {_STRATS}")
    out = out_col or value_col
    if strategy == "constant":
        if fill_value is None:
            raise ValueError("constant strategy needs fill_value")
        stat = F.lit(float(fill_value))
    else:
        agg = F.avg(value_col) if strategy == "mean" \
            else F.median(value_col)
        if group_cols:
            stat = agg.over(Window.partitionBy(*group_cols))
        else:
            # single scalar: one aggregate, joined as a literal via
            # crossJoin of a 1-row frame (broadcast, no window-all)
            row = df.agg(agg.alias("__s")).collect()[0]
            stat = F.lit(row["__s"])
    result = df
    if flag_col:
        # BEFORE the fill: when out_col == value_col the fill overwrites
        # the very column the flag must inspect
        result = result.withColumn(flag_col, F.col(value_col).isNull())
    return result.withColumn(out, F.coalesce(F.col(value_col)
                                             .cast("double"),
                                             stat.cast("double")))
