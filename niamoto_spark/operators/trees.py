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
        # an all-NULL feature has no min/max: fall through to the
        # constant-feature sentinel instead of crashing on float(None)
        if mm[f"mn_{c}"] is None:
            continue
        mn, mx = float(mm[f"mn_{c}"]), float(mm[f"mx_{c}"])
        if mx > mn:
            # the isNotNull guard matters: F.least SKIPS null args, so
            # a bare least(floor(NULL...), n_bins-1) would silently put
            # NULL values in the TOP bin instead of a NULL bin
            b = F.when(F.col(c).isNotNull(), F.least(
                F.floor((F.col(c).cast("double") - F.lit(mn))
                        * n_bins / F.lit(mx - mn)),
                F.lit(n_bins - 1))).cast("int")
        else:
            b = F.when(F.col(c).isNotNull(), F.lit(0)).cast("int")
        pairs.append(F.struct(F.lit(c).alias("feature"),
                              b.alias("bin")))
    if not pairs:
        # every feature is all-NULL: F.explode(F.array()) would fail at
        # analysis time (field extraction from an empty untyped array) —
        # short-circuit straight to the no-split sentinel rows
        return df.sparkSession.createDataFrame(
            [(c, -1, None, 0.0, None, None) for c in feature_cols],
            "feature string, split_bin int, threshold double, "
            "gain double, n_left bigint, n_right bigint")
    # one Expand: each row contributes one (feature, bin, y) triple
    # per feature — no join, no second scan.  NULL feature values get
    # a NULL bin and are dropped here: without the filter they'd sort
    # FIRST in the cumulative window and silently join every split's
    # left side; the split statistics are over the non-null population
    # (the histogram-GBDT convention).
    hist = (df.select(F.explode(F.array(*pairs)).alias("fb"),
                      y.alias("y"))
            .where(F.col("fb.bin").isNotNull())
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
        if mm[f"mn_{c}"] is None:
            continue
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
              if mm[f"mn_{c}"] is None
              or not (float(mm[f"mx_{c}"]) > float(mm[f"mn_{c}"]))]
    if consts:
        spark = df.sparkSession
        sent = spark.createDataFrame(
            [(c, -1, None, 0.0, None, None) for c in consts],
            "feature string, split_bin int, threshold double, "
            "gain double, n_left bigint, n_right bigint")
        out = out.unionByName(sent)
    return out


@register("boosted_stumps", PluginType.TRANSFORMER)
def boosted_stumps(df: DataFrame, feature_cols: "list[str]",
                   target_col: str, rounds: int = 2,
                   learning_rate: float = 0.5, n_bins: int = 8,
                   round_dp: int = 8) -> DataFrame:
    """Gradient boosting with depth-1 trees (squared loss): start from
    the global mean, then each round fits the variance-reduction-
    optimal stump to the CURRENT residuals and steps by
    ``learning_rate`` — LightGBM's "hist" recipe at its smallest, and
    the sequential half of the story whose per-round kernel is
    ``stump_split``.

    Reproducibility is engineered, not hoped for: the base score and
    every leaf step are quantized to integer MICRO-UNITS (1e-6), so
    residuals are exact integers, per-bin residual sums are exact
    (no float summation order anywhere), and gains/argmaxes are
    bit-identical across engines — the oracle unrolls the full
    boosting loop including the round-2 histogram over round-1's
    data-chosen split.  A 1e-6 step quantum is far below any
    learning-rate-scale signal.

    Per round: ONE Expand + (feature, bin) integer aggregation over
    the corpus; the boundary scan runs driver-side over the ≤
    |features|·n_bins histogram cells.  Training data never
    shuffles; only histograms move.  Returns the model table:
    (round, feature, split_bin, threshold, left_step, right_step,
    base_score)."""
    import math as _m

    def _half_away(x: float) -> int:
        """round-half-away-from-zero — SQL ROUND semantics (Python's
        round() is banker's, which flips exact .5 boundaries)."""
        return int(_m.floor(x + 0.5)) if x >= 0 else int(_m.ceil(x - 0.5))

    q = 1_000_000  # micro-units
    mm = df.agg(*[F.min(c).cast("double").alias(f"mn_{c}")
                  for c in feature_cols],
                *[F.max(c).cast("double").alias(f"mx_{c}")
                  for c in feature_cols]).first()
    bins = {}
    thr = {}
    for c in feature_cols:
        if mm[f"mn_{c}"] is None:       # all-NULL feature: constant
            bins[c] = F.lit(0)
            thr[c] = (0.0, 0.0)
            continue
        mn, mx = float(mm[f"mn_{c}"]), float(mm[f"mx_{c}"])
        if mx > mn:
            # when() guard: F.least skips NULL args (see stump_split)
            bins[c] = F.when(F.col(c).isNotNull(), F.least(
                F.floor((F.col(c).cast("double") - F.lit(mn))
                        * n_bins / F.lit(mx - mn)),
                F.lit(n_bins - 1))).cast("int")
        else:
            bins[c] = F.when(F.col(c).isNotNull(), F.lit(0)).cast("int")
        thr[c] = (mn, (mx - mn) / n_bins if mx > mn else 0.0)
    y = F.when(F.col(target_col).cast("double") != 0, 1) \
        .otherwise(0).cast("long")
    tot = df.agg(F.sum(y).alias("e"),
                 F.count(F.lit(1)).alias("n")).first()
    base_q = _half_away(q * tot["e"] / tot["n"])  # micro-units
    pred_q = F.lit(int(base_q)).cast("long")
    model_rows = []
    for rnd in range(rounds):
        resid_q = (y * q - pred_q).alias("__r")  # exact integer
        pairs = [F.struct(F.lit(c).alias("feature"),
                          bins[c].alias("bin")) for c in feature_cols]
        hist = (df.select(F.explode(F.array(*pairs)).alias("fb"),
                          resid_q)
                # NULL feature values (NULL bin) are excluded from the
                # histogram; prediction sends them right (the when()
                # below falls through to the right step)
                .where(F.col("fb.bin").isNotNull())
                .groupBy(F.col("fb.feature").alias("feature"),
                         F.col("fb.bin").alias("bin"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("__r").alias("s"))
                .collect())
        by_f: dict = {}
        for row in hist:
            by_f.setdefault(row["feature"], []).append(row)
        best = None
        for c in sorted(by_f):
            cells = sorted(by_f[c], key=lambda r: r["bin"])
            nt = sum(r["n"] for r in cells)
            st = sum(r["s"] for r in cells)     # exact int
            nl = 0
            sl = 0
            for cell in cells[:-1]:
                nl += cell["n"]
                sl += cell["s"]
                nr, sr = nt - nl, st - sl
                if nl == 0 or nr == 0:
                    continue
                # mirror SQL double arithmetic exactly: convert the
                # exact ints to doubles BEFORE multiplying (Python's
                # big-int product would round differently)
                gain = _half_away((float(sl) * float(sl) / nl
                                   + float(sr) * float(sr) / nr
                                   - float(st) * float(st) / nt)
                                  * 1e4) / 1e4
                key = (-gain, c, cell["bin"])
                if best is None or key < best[0]:
                    best = (key, c, cell["bin"], nl, sl, nt - nl,
                            st - sl)
        if best is None:
            break
        _, c, b, nl, sl, nr, sr = best
        lstep_q = _half_away(learning_rate * float(sl) / nl)
        rstep_q = _half_away(learning_rate * float(sr) / nr)
        model_rows.append(
            (rnd, c, int(b),
             round(thr[c][0] + (b + 1) * thr[c][1], 6),
             lstep_q / q, rstep_q / q, base_q / q))
        step_q = F.when(bins[c] <= b, F.lit(int(lstep_q))) \
            .otherwise(F.lit(int(rstep_q))).cast("long")
        pred_q = pred_q + step_q
    spark = df.sparkSession
    return spark.createDataFrame(
        model_rows,
        "round int, feature string, split_bin int, threshold double, "
        "left_step double, right_step double, base_score double")
