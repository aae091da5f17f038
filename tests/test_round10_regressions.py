"""Round-10 regression tests for the three r9 ADVICE findings:

1. hashed_dim_join silently dropped all matches when fact/dim key dtypes
   differed (xxhash64 is type-sensitive; plain equi-join implicitly casts).
2. streaming sessionization merged a late event into the open session even
   when it sat more than gap_s BEFORE session_start, where batch semantics
   emit it as its own session.
3. stump_split crashed at analysis time (explode of empty untyped array)
   when every feature column is all-NULL, instead of returning the no-split
   sentinel rows.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- advice 1

def test_hashed_dim_join_mixed_dtypes_matches_plain_join(spark):
    from niamoto_spark.functions import hashed_dim_join

    fact = spark.createDataFrame(
        [("5", 10.0), ("7", 20.0), ("5", 30.0), (None, 40.0)],
        "k string, v double")
    dim = spark.createDataFrame(
        [(5, "five"), (7, "seven"), (9, "nine")], "k bigint, name string")

    got = hashed_dim_join(fact, dim, "k", ["name"])
    plain = (fact.join(dim.withColumnRenamed("k", "__dk"),
                       fact["k"] == F.col("__dk"), "inner")
             .select("k", "v", "name"))
    assert sorted(map(tuple, got.select("k", "v", "name").collect())) \
        == sorted(map(tuple, plain.collect()))
    assert got.count() == 3  # the r9 bug returned 0 rows here


def test_hashed_dim_join_string_keys_still_hash_path(spark):
    from niamoto_spark.functions import hashed_dim_join

    fact = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("zz", 3.0), (None, 4.0)],
        "k string, v double")
    dim = spark.createDataFrame(
        [("a", 10), ("b", 20)], "k string, w int")
    got = hashed_dim_join(fact, dim, "k", ["w"])
    assert sorted(map(tuple, got.select("k", "v", "w").collect())) == \
        [("a", 1.0, 10), ("b", 2.0, 20)]
    # the hashed path is actually taken for matching string dtypes
    assert "xxhash64" in got._jdf.queryExecution().analyzed().toString()


# ---------------------------------------------------------------- advice 2

class _FakeState:
    """Minimal GroupState stand-in for unit-testing the fold."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def _fold(state, times, gap_s=1800):
    from niamoto_spark.streaming.sessions import _close_sessions

    out = list(_close_sessions(
        (1,), [pd.DataFrame({"ts_sec": times})], state, gap_s=gap_s))
    return pd.concat(out, ignore_index=True)


def test_late_event_beyond_gap_is_own_session():
    # open session starts at t=10000; a late event at t=100 is 9900s
    # earlier (>> gap 1800) — batch semantics: its own 1-event session.
    st = _FakeState((10000, 10050, 3))
    closed = _fold(st, [100])
    assert list(map(tuple, closed.itertuples(index=False))) == \
        [(1, 100, 100, 1)]
    assert st.get == (10000, 10050, 3)  # open session untouched


def test_late_event_within_gap_still_merges():
    st = _FakeState((10000, 10050, 3))
    closed = _fold(st, [9000])  # 1000s before start, within gap
    assert closed.empty
    assert st.get == (9000, 10050, 4)


def test_late_chain_bridges_into_open_session():
    # gap=10: events 85, 92 chain (gap 7) and 92 is within 10 of
    # start=100 — the whole thing is ONE session per batch semantics.
    st = _FakeState((100, 120, 2))
    closed = _fold(st, [85, 92], gap_s=10)
    assert closed.empty
    assert st.get == (85, 120, 4)


def test_late_chain_separate_when_gap_proven():
    # gap=10: events 50, 55 form their own session (55 < 100-10).
    st = _FakeState((100, 120, 2))
    closed = _fold(st, [50, 55], gap_s=10)
    assert list(map(tuple, closed.itertuples(index=False))) == \
        [(1, 50, 55, 2)]
    assert st.get == (100, 120, 2)


def test_stream_fold_matches_batch_on_out_of_order_replay(spark):
    """Feed the same events through the stateful fold in two batches with
    late arrivals, and through sessionize_batch — identical sessions."""
    from niamoto_spark.streaming.sessions import sessionize_batch

    # Late events land in sessions not yet closed (the documented
    # close-on-proof divergence: once a session is EMITTED, a later
    # late event for it can't be merged — excluded here by design).
    gap = 100
    batch1 = [5000, 5050, 9000, 9040, 13000]
    batch2 = [2000, 2050, 13030, 12950]  # late + out of order
    all_events = batch1 + batch2

    st = _FakeState()
    closed = pd.concat([_fold(st, batch1, gap_s=gap),
                        _fold(st, batch2, gap_s=gap)], ignore_index=True)
    sessions = sorted(map(tuple, closed[["session_start", "session_end",
                                         "n_events"]].itertuples(index=False)))
    if st.exists:
        sessions = sorted(sessions + [st.get])

    df = spark.createDataFrame(
        [(i, pd.Timestamp(t, unit="s").to_pydatetime(), 1)
         for i, t in enumerate(all_events)],
        "event_id long, ts timestamp, user_id long")
    expect = sorted(map(tuple, sessionize_batch(df, gap_s=gap)
                        .select("session_start", "session_end", "n_events")
                        .collect()))
    assert sessions == expect


# ---------------------------------------------------------------- advice 3

def test_stump_split_all_null_features_returns_sentinels(spark):
    from niamoto_spark.operators.trees import stump_split

    df = spark.createDataFrame(
        [(None, None, 1), (None, None, 0), (None, None, 1)],
        "f1 double, f2 double, y int")
    out = stump_split(df, ["f1", "f2"], "y")
    rows = sorted(map(tuple, out.collect()))
    assert rows == [("f1", -1, None, 0.0, None, None),
                    ("f2", -1, None, 0.0, None, None)]


def test_stump_split_mixed_null_and_real_features(spark):
    from niamoto_spark.operators.trees import stump_split

    df = spark.createDataFrame(
        [(None, 1.0, 0), (None, 2.0, 0), (None, 9.0, 1), (None, 10.0, 1)],
        "f1 double, f2 double, y int")
    out = {r["feature"]: r for r in stump_split(df, ["f1", "f2"], "y").collect()}
    assert out["f1"]["split_bin"] == -1 and out["f1"]["gain"] == 0.0
    assert out["f2"]["split_bin"] >= 0 and out["f2"]["gain"] > 0
