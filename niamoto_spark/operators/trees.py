"""Histogram-based decision-tree split finding — the distributed
primitive under every GBDT/random-forest trainer (XGBoost/LightGBM
"hist" mode): bin each feature, aggregate label statistics per bin,
scan bin boundaries for the impurity-optimal threshold.

Parity target: the reference has no tree tooling (its ml/ subsystem is
scoped out per COVERAGE.md); this extends the training-data lane with
the split-finding kernel a tabular pipeline needs for feature ranking
and shallow-model baselines.

Scale design: the data-sized work is ONE unpivot projection (single
Expand, no join) plus ONE hash aggregation on (feature, bin) — at
most |features|·n_bins output rows regardless of input size.  The
boundary scan, gain algebra and per-feature argmax run as window
functions over that tiny table.  Label statistics are exact integer
counts, so the gain arithmetic is engine-independent and the whole
operator replays in SQL (the oracle recomputes every histogram and
every candidate gain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register


@register("stump_split", PluginType.TRANSFORMER)
def stump_split(df: DataFrame, feature_cols: "list[str]",
                target_col: str, n_bins: int = 32,
                round_dp: int = 8) -> DataFrame:
    """Best single split per feature for a BINARY target, by Gini
    gain over an ``n_bins`` equal-width histogram.

    For each feature f with range [mn, mx], every row lands in
    bin = least(floor((v − mn) · n_bins / (mx − mn)), n_bins − 1);
    a candidate split "v ≤ threshold(b)" exists after every non-final
    bin b, and its gain is

        gini(N, E) = 1 − (E/N)² − ((N−E)/N)²
        gain(b) = gini(N, E) − nl/N·gini(nl, el) − nr/N·gini(nr, er)

    computed from exact integer counts (nl/el are prefix sums over the
    histogram).  Returns one row per feature:
    (feature, split_bin, threshold, gain, n_left, n_right), the
    per-feature argmax with ties broken toward the smaller bin.
    Constant features (mx == mn) report split_bin −1 and gain 0.
    """
    mm = df.agg(*[F.min(c).cast("double").alias(f"mn_{c}")
                  for c in feature_cols],
                *[F.max(c).cast("double").alias(f"mx_{c}")
                  for c in feature_cols]).first()
    y = F.when(F.col(target_col).cast("double") != 0, 1).otherwise(0)
    pairs = []
    for c in feature_cols:
        mn, mx = float(mm[f"mn_{c}"]), float(mm[f"mx_{c}"])
        if mx > mn:
            b = F.least(
                F.floor((F.col(c).cast("double") - F.lit(mn))
                        * n_bins / F.lit(mx - mn)),
                F.lit(n_bins - 1)).cast("int")
        else:
            b = F.lit(0)
        pairs.append(F.struct(F.lit(c).alias("feature"),
                              b.alias("bin")))
    # one Expand: each row contributes one (feature, bin, y) triple
    # per feature — no join, no second scan
    hist = (df.select(F.explode(F.array(*pairs)).alias("fb"),
                      y.alias("y"))
            .groupBy(F.col("fb.feature").alias("feature"),
                     F.col("fb.bin").alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("y").alias("e")))
    wf = Window.partitionBy("feature")
    wcum = wf.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (hist
           .withColumn("nl", F.sum("n").over(wcum))
           .withColumn("el", F.sum("e").over(wcum))
           .withColumn("nt", F.sum("n").over(wf))
           .withColumn("et", F.sum("e").over(wf))
           .withColumn("maxb", F.max("bin").over(wf)))

    def gini(n, e):
        n, e = n.cast("double"), e.cast("double")
        return F.when(n > 0,
                      1.0 - (e / n) * (e / n)
                      - ((n - e) / n) * ((n - e) / n)).otherwise(0.0)

    nr = F.col("nt") - F.col("nl")
    er = F.col("et") - F.col("el")
    parent = gini(F.col("nt"), F.col("et"))
    child = (F.col("nl").cast("double") / F.col("nt")
             * gini(F.col("nl"), F.col("el"))
             + nr.cast("double") / F.col("nt") * gini(nr, er))
    cand = (cum.where(F.col("bin") < F.col("maxb"))
            .withColumn("gain", F.round(parent - child, round_dp)))
    pick = Window.partitionBy("feature").orderBy(
        F.col("gain").desc(), F.col("bin").asc())
    best = (cand.withColumn("__rk", F.row_number().over(pick))
            .where(F.col("__rk") == 1))
    # threshold from the frozen (mn, mx): right edge of the split bin
    thr = F.lit(None).cast("double")
    for c in feature_cols:
        mn, mx = float(mm[f"mn_{c}"]), float(mm[f"mx_{c}"])
        t = (F.lit(mn) + (F.col("bin") + 1)
             * F.lit((mx - mn) / n_bins if mx > mn else 0.0))
        thr = F.when(F.col("feature") == c, t).otherwise(thr)
    out = best.select(
        "feature", F.col("bin").alias("split_bin"),
        F.round(thr, 6).alias("threshold"), "gain",
        F.col("nl").alias("n_left"),
        (F.col("nt") - F.col("nl")).alias("n_right"))
    # constant features never produce a candidate row: re-add with a
    # no-split sentinel so the output always has |feature_cols| rows
    consts = [c for c in feature_cols
              if not (float(mm[f"mx_{c}"]) > float(mm[f"mn_{c}"]))]
    if consts:
        spark = df.sparkSession
        sent = spark.createDataFrame(
            [(c, -1, None, 0.0, None, None) for c in consts],
            "feature string, split_bin int, threshold double, "
            "gain double, n_left bigint, n_right bigint")
        out = out.unionByName(sent)
    return out
