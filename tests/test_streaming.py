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
