"""asof_join: parity with pandas.merge_asof on randomized data, edge
cases (null ts, empty right, tolerance), and the one-shuffle plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from niamoto_spark.operators.asof import asof_join


def _mk(spark, seed=7, n_left=200, n_right=120, keys=5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, keys, n_left),
        "lts": rng.integers(0, 1000, n_left).astype("float64"),
        "lid": np.arange(n_left),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, keys, n_right),
        "rts": rng.integers(0, 1000, n_right).astype("float64"),
        "v": rng.normal(size=n_right).round(6),
    })
    # merge_asof needs unique (k, ts) on the right for determinism
    right = right.groupby(["k", "rts"], as_index=False)["v"].max()
    return (spark.createDataFrame(left), spark.createDataFrame(right),
            left, right)


def _pandas_asof(left, right, direction="backward", strict=False,
                 tolerance=None):
    lt, rt = left.sort_values("lts"), right.sort_values("rts")
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = tolerance
    out = pd.merge_asof(lt, rt, left_on="lts", right_on="rts", by="k",
                        direction=direction, allow_exact_matches=not strict,
                        **kw)
    return out.sort_values("lid")["v"].reset_index(drop=True)


def _spark_asof(sl, sr, **kw):
    out = asof_join(sl, sr, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["v"], **kw)
    pdf = out.orderBy("lid").toPandas()
    return pdf["v"].reset_index(drop=True)


@pytest.mark.parametrize("direction,strict", [
    ("backward", False), ("backward", True),
    ("forward", False), ("forward", True)])
def test_merge_asof_parity(spark, direction, strict):
    sl, sr, left, right = _mk(spark)
    got = _spark_asof(sl, sr, direction=direction, strict=strict)
    want = _pandas_asof(left, right, direction=direction, strict=strict)
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_tolerance(spark):
    sl, sr, left, right = _mk(spark, seed=11)
    got = _spark_asof(sl, sr, tolerance=50.0)
    want = _pandas_asof(left, right, tolerance=50.0)
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_empty_right(spark):
    sl, sr, _, _ = _mk(spark)
    got = _spark_asof(sl, sr.where(F.lit(False)))
    assert got.isna().all()


def test_null_ts_rows(spark):
    sl = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "lts": [10.0, None], "lid": [0, 1]}))
    sr = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rts": [5.0, None], "v": [1.5, 9.9]}))
    out = (asof_join(sl, sr, on="k", left_ts="lts", right_ts="rts",
                     value_cols=["v"])
           .orderBy("lid").toPandas())
    assert out["v"].tolist()[0] == 1.5      # normal match; null-ts right row ignored
    assert pd.isna(out["v"].tolist()[1])    # null left ts matches nothing


def test_matched_ts_and_collision_guard(spark):
    sl, sr, _, _ = _mk(spark)
    out = asof_join(sl, sr, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["v"], matched_ts_col="mts")
    row = out.where(F.col("v").isNotNull()).select("lts", "mts").first()
    assert row["mts"] <= row["lts"]
    with pytest.raises(ValueError, match="already exist"):
        asof_join(sl.withColumn("v", F.lit(0)), sr, on="k",
                  left_ts="lts", right_ts="rts", value_cols=["v"])


def test_plan_one_shuffle_no_join(spark):
    """The whole as-of join must be one hash Exchange + Window — never a
    physical join (a range join here would be O(n*m) per key at scale)."""
    sl, sr, _, _ = _mk(spark)
    out = asof_join(sl, sr, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
