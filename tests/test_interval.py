"""Interval join (operators/interval.py): granule co-partitioning must
reproduce the naive theta-join semantics exactly."""

import pytest
from pyspark.sql import functions as F

from niamoto_spark.operators.interval import interval_join


@pytest.fixture()
def sides(spark):
    intervals = spark.createDataFrame(
        [("u1", 1, 100, 200), ("u1", 2, 150, 250), ("u2", 3, 100, 200),
         ("u1", 4, 0, 50_000),  # spans many granules
         ("u3", 5, 300, 400)],  # no points at all
        ["key", "iv_id", "start_s", "end_s"])
    points = spark.createDataFrame(
        [("u1", 100, 1.0),   # == start: inside (half-open)
         ("u1", 199, 2.0),   # == end-1: inside
         ("u1", 200, 3.0),   # == end: outside iv 1, inside iv 2
         ("u2", 150, 4.0),
         ("u2", 99, 5.0),    # before start
         ("u1", 49_999, 6.0)],
        ["key", "pt_s", "val"])
    return intervals, points


def _naive(intervals, points):
    return (intervals.join(
        points,
        (intervals.key == points.key) & (intervals.start_s <= points.pt_s)
        & (points.pt_s < intervals.end_s))
        .select(intervals.key, "iv_id", "pt_s"))


def test_matches_naive_theta_join(spark, sides):
    intervals, points = sides
    got = interval_join(points, intervals, on="key", point_ts="pt_s",
                        start_col="start_s", end_col="end_s", granule_s=64)
    got_set = {(r["iv_id"], r["pt_s"]) for r in got.collect()}
    want_set = {(r["iv_id"], r["pt_s"])
                for r in _naive(intervals, points).collect()}
    assert got_set == want_set
    assert (1, 100) in got_set and (1, 199) in got_set
    assert (1, 200) not in got_set and (2, 200) in got_set


@pytest.mark.parametrize("granule", [1, 7, 100, 10_000])
def test_granule_size_never_changes_semantics(spark, sides, granule):
    intervals, points = sides
    got = interval_join(points, intervals, on="key", point_ts="pt_s",
                        start_col="start_s", end_col="end_s",
                        granule_s=granule, max_granules=100_000)
    want = _naive(intervals, points)
    assert ({(r["iv_id"], r["pt_s"]) for r in got.collect()}
            == {(r["iv_id"], r["pt_s"]) for r in want.collect()})


def test_no_duplicate_pairs_across_granules(spark, sides):
    """An interval spanning many granules must still match each contained
    point exactly once."""
    intervals, points = sides
    got = interval_join(points, intervals, on="key", point_ts="pt_s",
                        start_col="start_s", end_col="end_s", granule_s=16)
    rows = [r for r in got.collect() if r["iv_id"] == 4]
    assert len(rows) == len({(r["iv_id"], r["pt_s"]) for r in rows})
    # iv 4 [0, 50000) contains all four u1 points
    assert len(rows) == 4


def test_left_outer_keeps_empty_intervals(spark, sides):
    intervals, points = sides
    got = interval_join(points, intervals, on="key", point_ts="pt_s",
                        start_col="start_s", end_col="end_s",
                        granule_s=64, how="left_outer")
    by_iv = {}
    for r in got.collect():
        by_iv.setdefault(r["iv_id"], []).append(r)
    assert 5 in by_iv and by_iv[5][0]["pt_s"] is None
    assert all(r["pt_s"] is not None for r in by_iv[1])


def test_max_granules_truncates_runaway_interval(spark):
    intervals = spark.createDataFrame(
        [("k", 1, 0, 10_000_000)], ["key", "iv_id", "start_s", "end_s"])
    points = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 9_999_999, 2.0)], ["key", "pt_s", "val"])
    got = interval_join(points, intervals, on="key", point_ts="pt_s",
                        start_col="start_s", end_col="end_s",
                        granule_s=10, max_granules=100)
    vals = {r["pt_s"] for r in got.collect()}
    assert 5 in vals            # within the kept granules
    assert 9_999_999 not in vals  # beyond the cap: documented truncation
