"""Custom stateful streaming: gap-based sessionization with
``applyInPandasWithState`` — the pattern for operators Structured Streaming
lacks natively (per instructions: composition first, then Pandas-UDF state).

Batch parity: ``sessionize_batch`` is the window-function equivalent
(the q31 semantics); the streaming version maintains per-user open-session
state and emits a row when a session closes (gap exceeded via event time or
state timeout on watermark advance).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.LongType()),   # epoch seconds
    T.StructField("session_end", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start", T.LongType()),
    T.StructField("last", T.LongType()),
    T.StructField("n", T.LongType()),
])


def _close_sessions(key: Tuple, pdfs: Iterable[pd.DataFrame],
                    state: GroupState, gap_s: int = 1800,
                    use_timeout: bool = False):
    """Fold this batch's events into the open session; emit every session
    that the new events close.  State: (start, last, n) of the open one."""
    user_id = key[0]
    closed = []
    if state.hasTimedOut:
        if state.exists:
            s, l, n = state.get
            closed.append((user_id, s, l, n))
        state.remove()
    else:
        times = []
        for pdf in pdfs:
            times.extend(int(t) for t in pdf["ts_sec"])
        times.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        for t in times:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                # A late event (within watermark) can arrive with t < last
                # once batches interleave; fold it monotonically so the
                # open session's bounds never regress.
                start, last, n = min(start, t), max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
            if use_timeout:
                state.setTimeoutDuration(gap_s * 1000)
    yield pd.DataFrame(closed, columns=["user_id", "session_start",
                                        "session_end", "n_events"])


def sessionize_stream(events: DataFrame, gap_s: int = 1800,
                      watermark: str = "1 hour",
                      close_on_timeout: bool = False) -> DataFrame:
    """Streaming sessionization: emits CLOSED sessions.

    ``close_on_timeout=False`` (default) closes a session only when a later
    event proves the gap — open sessions persist in state, and bounded runs
    (``trigger(availableNow)``) terminate cleanly.  ``True`` additionally
    closes idle sessions via ProcessingTimeTimeout, the mode for an
    always-on deployment (the query then never self-terminates, which is
    the point of an always-on stream).
    """
    src = events.withWatermark("ts", watermark) \
        .withColumn("ts_sec", F.col("ts").cast("long"))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if close_on_timeout
               else GroupStateTimeout.NoTimeout)
    return (src.groupBy("user_id")
            .applyInPandasWithState(
                lambda key, pdfs, state: _close_sessions(
                    key, pdfs, state, gap_s, use_timeout=close_on_timeout),
                outputStructType=SESSION_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch equivalent (window functions): one row per session."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    sec = F.col("ts_sec")
    prev = F.lag(sec).over(w)
    new_flag = F.when(prev.isNull() | ((sec - prev) > gap_s), 1).otherwise(0)
    tagged = (events.withColumn("ts_sec", F.col("ts").cast("long"))
              .withColumn("__new", new_flag)
              .withColumn("session_no", F.sum("__new").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    return (tagged.groupBy("user_id", "session_no")
            .agg(F.min("ts_sec").alias("session_start"),
                 F.max("ts_sec").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"))
            .drop("session_no"))
