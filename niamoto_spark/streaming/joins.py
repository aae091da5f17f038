"""Stream-stream event-time joins (Structured Streaming).

The streaming counterpart of operators/interval.py's batch interval
join: two live streams joined on a key + event-time range, with
watermarks bounding both sides' join state.

Spark executes this as a symmetric stateful hash join: each side buffers
rows keyed by (join key) until its watermark passes the range bound, so
state size is (event rate × window span), independent of total history —
the shape that survives unbounded streams.  The time-range condition is
REQUIRED: without it Spark must buffer both streams forever (the query
is rejected for append-mode output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(points: DataFrame, intervals: DataFrame,
                         on: str, point_ts: str, interval_ts: str,
                         span_s: int,
                         watermark: str = "2 hours") -> DataFrame:
    """Join each point row to interval-opening rows of the same key whose
    [interval_ts, interval_ts + span_s) window contains point_ts.

    Both inputs must be streaming DataFrames with TIMESTAMP event-time
    columns named ``point_ts`` / ``interval_ts`` (distinct names — rename
    before calling).  Watermarks are applied here; the range predicate
    lets Spark expire buffered state once the other side's watermark
    passes interval_ts + span_s.
    """
    p = points.withWatermark(point_ts, watermark)
    i = intervals.withWatermark(interval_ts, watermark)
    cond = (
        (p[on] == i[on]) &
        (p[point_ts] >= i[interval_ts]) &
        (p[point_ts] < i[interval_ts] + F.expr(f"INTERVAL {span_s} SECONDS"))
    )
    return i.join(p, cond, "inner").drop(p[on])


def stream_left_outer_join(left: DataFrame, right: DataFrame,
                           on: str, left_ts: str, right_ts: str,
                           span_s: int,
                           watermark: str = "2 hours") -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every left row joins
    right rows of the same key with right_ts in [left_ts, left_ts +
    span_s); a left row that never matches is emitted ONCE with nulls
    on the right side — but only after BOTH watermarks pass its window
    bound, because until then a matching right row could still arrive.

    That late-null semantics is the operational catch: unmatched rows
    near the stream head stay buffered until later data advances the
    watermark.  Batch drains (availableNow) that need ALL rows resolved
    should append a far-future flush row to both streams (see q220) —
    the streaming equivalent of an end-of-stream marker.

    State size is bounded exactly as in the inner join: each side
    buffers (rate × (span + watermark delay)) rows per key partition.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[on] == r[on]) &
        (r[right_ts] >= l[left_ts]) &
        (r[right_ts] < l[left_ts] + F.expr(f"INTERVAL {span_s} SECONDS"))
    )
    return l.join(r, cond, "leftOuter").drop(r[on])
