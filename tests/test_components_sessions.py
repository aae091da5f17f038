"""Connected components + stateful streaming sessionization + dirty CSV."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from niamoto_spark.operators.components import (connected_components,
                                                dedup_keep_components)


def test_connected_components_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: greedy drop would miss that
    # 3 links to 1 only through 2
    pairs = spark.createDataFrame(pd.DataFrame(
        {"id_a": [1, 2, 3, 10], "id_b": [2, 3, 4, 11]}))
    comps = {r["node_id"]: r["component_id"]
             for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_keep_components(spark):
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2, 3, 4, 10, 11, 99]}))
    pairs = spark.createDataFrame(pd.DataFrame(
        {"id_a": [1, 2, 3, 10], "id_b": [2, 3, 4, 11]}))
    kept = {r["doc_id"] for r in
            dedup_keep_components(docs, pairs, "doc_id").collect()}
    assert kept == {1, 10, 99}  # one representative per cluster + untouched


def test_streaming_sessionization_matches_batch(spark, tmp_path):
    from niamoto_spark.streaming.sessions import (sessionize_batch,
                                                  sessionize_stream)

    ts = (
        list(pd.date_range("2024-01-01 00:00", periods=5, freq="5min"))    # s1
        + list(pd.date_range("2024-01-01 02:00", periods=3, freq="10min"))  # s2
        + list(pd.date_range("2024-01-01 05:00", periods=2, freq="1min"))   # s3
    )
    pdf = pd.DataFrame({
        "event_id": range(len(ts)), "ts": ts,
        "user_id": [7] * len(ts), "value": [1.0] * len(ts)})
    path = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)

    batch = sessionize_batch(spark.read.parquet(path)).collect()
    assert len(batch) == 3
    assert sorted(r["n_events"] for r in batch) == [2, 3, 5]

    stream = sessionize_stream(spark.readStream
                               .schema(spark.read.parquet(path).schema)
                               .parquet(path))
    q = (stream.writeStream.format("memory").queryName("sess_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("sess_stream").collect()
    # availableNow closes the first two sessions (the third stays open in
    # state until timeout/next batch) — verify the closed ones match batch
    closed = sorted((r["session_start"], r["session_end"], r["n_events"])
                    for r in got)
    expect = sorted((r["session_start"], r["session_end"], r["n_events"])
                    for r in batch)[:len(closed)]
    assert len(closed) >= 2
    assert closed == expect


def test_session_state_fold_late_event_does_not_regress_bounds():
    """A late event (t < state.last, still within watermark) folds into the
    open session without shrinking session_end or growing a false gap."""
    from niamoto_spark.streaming.sessions import _close_sessions

    class FakeState:
        def __init__(self, value):
            self._v = value
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

    # open session [1000, 2000] with 3 events; batch delivers a late event
    # at 1500 then an on-time one at 2100 (gap 1800 keeps all in-session)
    st = FakeState((1000, 2000, 3))
    pdf = pd.DataFrame({"ts_sec": [2100, 1500]})
    out = list(_close_sessions((7,), [pdf], st, gap_s=1800))
    assert len(out) == 1 and out[0].empty  # nothing closed
    assert st.get == (1000, 2100, 5)  # last advanced to 2100, never 1500

    # and a late event must not fabricate a session split: state last=2000,
    # late t=100 (t - last = -1900 < -gap) still belongs to the open session
    st2 = FakeState((1000, 2000, 3))
    out2 = list(_close_sessions((7,), [pd.DataFrame({"ts_sec": [100]})],
                                st2, gap_s=1800))
    assert out2[0].empty
    assert st2.get == (100, 2000, 4)  # start extends back, end unchanged


def test_dirty_csv_delimiter_sniffing(spark, tmp_path):
    """FIXTURES.md F7: semicolon-delimited variant, padded values."""
    from niamoto_spark.sources.files import read_csv_auto, sniff_delimiter

    p = tmp_path / "dirty.csv"
    p.write_text("id;name;value\n1;  alpha  ;10.5\n2;beta;bad\n3;gamma;\n")
    assert sniff_delimiter(str(p)) == ";"
    df = read_csv_auto(spark, str(p))
    assert df.columns == ["id", "name", "value"]
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 3
    # mixed-type column falls back to string, not a crash
    assert rows[2]["value"] == "bad"


def test_tab_delimited_sniffing(spark, tmp_path):
    from niamoto_spark.sources.files import read_csv_auto

    p = tmp_path / "data.tsv"
    p.write_text("a\tb\n1\tx\n2\ty\n")
    df = read_csv_auto(spark, str(p))
    assert df.count() == 2 and df.columns == ["a", "b"]
