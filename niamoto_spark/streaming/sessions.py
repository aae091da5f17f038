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
        # Disjoint session intervals [start, last, n], sorted, pairwise
        # separated by > gap_s.  The open session from state is one such
        # interval; late-but-within-watermark events can land BEFORE it
        # (t < start - gap_s), and batch semantics make those their own
        # session rather than stretching the open one — so events merge
        # into whichever interval they fall within gap_s of, and intervals
        # that a new event bridges are coalesced.  This matches
        # sessionize_batch exactly because every interval is a valid gap
        # chain (no internal gap can exceed gap_s by construction).
        sessions: list = []
        if state.exists:
            sessions.append(list(state.get))
        for t in times:
            for iv in sessions:
                if iv[0] - gap_s <= t <= iv[1] + gap_s:
                    iv[0] = min(iv[0], t)
                    iv[1] = max(iv[1], t)
                    iv[2] += 1
                    break
            else:
                sessions.append([t, t, 1])
            sessions.sort(key=lambda iv: iv[0])
            merged = [sessions[0]]
            for iv in sessions[1:]:
                if iv[0] - merged[-1][1] <= gap_s:
                    merged[-1][1] = max(merged[-1][1], iv[1])
                    merged[-1][2] += iv[2]
                else:
                    merged.append(iv)
            sessions = merged
        if sessions:
            # All but the latest interval are proven closed (a later chain
            # sits > gap_s after them); the latest stays open in state.
            closed.extend((user_id, s, l, n) for s, l, n in sessions[:-1])
            state.update(tuple(sessions[-1]))
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
    # sessionization is an event-TIME operator: rows without a
    # timestamp are dropped (watermarked aggregates would drop them
    # anyway, but applyInPandasWithState receives them raw and the
    # fold would crash on int(NaN))
    src = events.where(F.col("ts").isNotNull()) \
        .withWatermark("ts", watermark) \
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
