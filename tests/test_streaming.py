"""Structured Streaming parity: the windowed events aggregate produces the
same result via readStream+availableNow as via batch."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from niamoto_spark.streaming.events import (run_stream_to_batch_parity,
                                            windowed_event_counts)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, spark):
    path = str(tmp_path_factory.mktemp("events_stream"))
    pdf = pd.DataFrame({
        "event_id": range(100),
        "ts": pd.date_range("2024-01-01", periods=100, freq="7min"),
        "user_id": [i % 5 for i in range(100)],
        "event_type": ["click" if i % 2 else "view" for i in range(100)],
        "value": [float(i) for i in range(100)],
    })
    spark.createDataFrame(pdf).repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_stream_matches_batch(spark, events_dir):
    batch = windowed_event_counts(spark.read.parquet(events_dir), "1 hour")
    streamed = run_stream_to_batch_parity(spark, events_dir, "1 hour")
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, streamed.collect()))
    assert b == s and len(b) > 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from niamoto_spark.streaming.dedup import dedup_stream

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:05",
                              "2024-01-01 00:10", "2024-01-01 00:15"]),
        "text": ["same words", "same  WORDS", "different", "same words"],
    })
    path = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(path)
    stream = dedup_stream(
        spark.readStream.schema(spark.read.parquet(path).schema).parquet(path))
    q = (stream.writeStream.format("memory").queryName("dedup_s")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    kept = sorted(r["doc_id"] for r in spark.table("dedup_s").collect())
    assert len(kept) == 2                # one 'same words' + 'different'
    assert 3 in kept


def test_stream_static_anti_join_dedup(spark, tmp_path):
    from niamoto_spark.streaming.dedup import dedup_stream_against_corpus

    corpus = spark.createDataFrame(
        pd.DataFrame({"fingerprint": []}), "fingerprint string")
    import hashlib
    known = hashlib.md5(b"already seen").hexdigest()
    corpus = spark.createDataFrame(pd.DataFrame({"fingerprint": [known]}))
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["already seen", "brand new"]}))
    kept = dedup_stream_against_corpus(docs, corpus).collect()
    assert [r["doc_id"] for r in kept] == [2]
