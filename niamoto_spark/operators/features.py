"""ML feature-engineering transforms with leakage discipline — the
encodings a tabular/training pipeline applies before model fitting.

Partner modules: operators/classifier.py consumes hashed text features;
operators/text.py:split_assign_grouped guards split leakage; this
module guards TARGET leakage — encodings derived from the label must
exclude each row's own label (leave-one-out), or the feature memorizes
the answer.

Everything is window/aggregate arithmetic — no UDFs, one shuffle per
encoding on the category key — and exactly replayable in SQL (the
oracle refits the encoding end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("target_encode_loo", PluginType.TRANSFORMER)
def target_encode_loo(df: DataFrame, cat_col: str, target_col: str,
                      prior_weight: float = 10.0,
                      out_col: str = "te",
                      round_dp: int = 4) -> DataFrame:
    """Leave-one-out target (mean) encoding with additive smoothing:

        te_i = (sum_g - y_i + m * prior) / (n_g - 1 + m)

    where sum_g/n_g are the row's category aggregates, prior is the
    GLOBAL target mean, and m = ``prior_weight`` pseudo-observations
    pull small categories toward the prior (the standard shrinkage that
    keeps 1-row categories from exploding: with n_g = 1 the formula
    degenerates to exactly the prior).  Excluding the row's own label
    is what makes the feature safe to train on.

    One aggregate on the category key + one broadcast-sized global
    scalar; the join back is on the same key as the aggregate, so AQE
    reuses the exchange.  Null categories encode to the prior.
    """
    prior = df.agg(F.avg(target_col)).first()[0]
    if prior is None:
        raise ValueError("target_encode_loo: no non-null targets")
    per = (df.where(F.col(cat_col).isNotNull())
           .groupBy(cat_col)
           .agg(F.sum(target_col).alias("__sum"),
                F.count(target_col).alias("__n")))
    joined = df.join(per, cat_col, "left")
    m = float(prior_weight)
    # rows with a null target were never counted in (__sum, __n), so
    # they take the plain smoothed mean; rows with no category (or an
    # unseen one after the left join) take exactly the prior
    loo = ((F.col("__sum") - F.col(target_col) + m * prior) /
           (F.col("__n") - 1 + m))
    plain = ((F.col("__sum") + m * prior) / (F.col("__n") + m))
    te = (F.when(F.col("__n").isNull(), F.lit(prior))
           .when(F.col(target_col).isNull(), plain)
           .otherwise(loo))
    return (joined.withColumn(out_col, F.round(te, round_dp))
            .drop("__sum", "__n"))
