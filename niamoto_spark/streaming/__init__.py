"""Structured Streaming variants of the batch operators.

The reference has NO streaming surface (SURVEY §0) — this module is part of
the scale extension: the ``events`` table is an append stream in a real
deployment, and the same aggregations the batch engine runs should be
runnable incrementally.
"""

from niamoto_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    windowed_event_counts,
)
