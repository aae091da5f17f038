"""Streaming ingestion of the append-only ``events`` table.

Batch parity: ``windowed_event_counts`` produces exactly the batch
``groupBy(window, event_type).agg(...)`` result when run with
``trigger(availableNow=True)`` over a static directory — the test suite
verifies stream-vs-batch equality that way.

Scale notes: watermark bounds state; the window aggregate is a streaming
hash aggregate with partial aggregation per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, path: str,
                       schema=None, max_files_per_trigger: int = 8) -> DataFrame:
    """readStream over a parquet directory (files appear atomically =
    append-only source)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums per event_type with late-data
    tolerance ``watermark``."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "value_sum"))


def run_stream_to_batch_parity(spark: SparkSession, path: str,
                               window: str = "1 hour") -> DataFrame:
    """Run the windowed aggregate as a stream with availableNow and return
    the materialized result (used by tests to assert parity with batch)."""
    stream = read_events_stream(spark, path)
    agg = windowed_event_counts(stream, window)
    q = (agg.writeStream.format("memory").queryName("events_windowed")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table("events_windowed")
