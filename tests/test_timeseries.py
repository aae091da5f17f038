"""Time-series densification + cohort retention
(operators/timeseries.py)."""

from pyspark.sql import functions as F

from niamoto_spark.operators.timeseries import (cohort_retention,
                                                fill_time_gaps)


def test_gap_filling_emits_zero_rows(spark):
    agg = spark.createDataFrame(
        [("k1", 10, 5), ("k1", 13, 2), ("k2", 100, 1)],
        ["key", "bucket", "n"])
    out = {(r["key"], r["bucket"]): r["n"]
           for r in fill_time_gaps(agg, "key", "bucket",
                                   fill={"n": 0}).collect()}
    assert out[("k1", 10)] == 5 and out[("k1", 13)] == 2
    assert out[("k1", 11)] == 0 and out[("k1", 12)] == 0
    assert ("k1", 14) not in out          # never beyond the key's span
    assert out[("k2", 100)] == 1 and len(out) == 5


def test_gap_filling_truncates_runaway_span(spark):
    agg = spark.createDataFrame(
        [("bad", 0, 1), ("bad", 10_000_000, 1)], ["key", "bucket", "n"])
    out = fill_time_gaps(agg, "key", "bucket", fill={"n": 0},
                         max_buckets_per_key=100)
    assert out.count() == 100


def test_cohort_retention_triangle(spark):
    # u1 first day 0, active days 0/1/3; u2 first day 1, active 1 only;
    # u3 first day 0, active 0 and 3
    rows = [("u1", 10), ("u1", 90_000), ("u1", 260_000),
            ("u2", 100_000), ("u3", 20), ("u3", 270_000),
            ("u1", 30)]  # same-day repeat must not double count
    df = spark.createDataFrame(rows, ["user", "sec"])
    out = {(r["cohort_bucket"], r["bucket_offset"]): r["n_users"]
           for r in cohort_retention(df, "user", "sec").collect()}
    assert out[(0, 0)] == 2      # u1, u3
    assert out[(0, 1)] == 1      # u1
    assert out[(0, 3)] == 2      # u1, u3
    assert out[(1, 0)] == 1      # u2
    assert len(out) == 4


def test_gap_filling_truncation_warns(spark, caplog):
    import logging

    agg = spark.createDataFrame(
        [("bad", 0, 1), ("bad", 10_000_000, 1)], ["key", "bucket", "n"])
    with caplog.at_level(logging.WARNING,
                         logger="niamoto_spark.operators.timeseries"):
        fill_time_gaps(agg, "key", "bucket", fill={"n": 0},
                       max_buckets_per_key=100).count()
    assert any("truncated" in r.message for r in caplog.records)
