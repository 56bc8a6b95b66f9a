"""Custom stateful streaming operator: gap-based sessionization.

The batch engine sessionizes with lag + running-sum windows
(plans.analytics.q_events_sessionize); on an unbounded stream that needs
per-key state. This is the canonical ``applyInPandasWithState`` shape:

- stream grouped by user_id;
- state per user = the open session (start, last_ts, n_events);
- a new event either extends the open session (gap ≤ threshold) or closes it
  (the closed session is EMITTED and a fresh one opens);
- processing-time timeout flushes idle open sessions.

Arrow moves each group's rows in batches; state is a tiny tuple — this scales
to any key cardinality because state lives in the state store, partitioned by
the grouping key, exactly like a streaming aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ns", T.LongType()),
        T.StructField("session_end_ns", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # gap | timeout
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ns", T.LongType()),
        T.StructField("last_ns", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

GAP_NS = 1_800_000_000_000  # 30 min, matches the batch sessionizer


def make_sessionizer(gap_ns: int = GAP_NS, timeout_ms: int | None = 60_000):
    """Build the per-group stateful function (pure; unit-testable).

    ``timeout_ms=None`` disables idle-session flushing (no processing-time
    timeouts registered — required for run-to-completion AvailableNow jobs,
    which otherwise stay alive waiting for timeouts to fire)."""
    import pandas as pd  # noqa: PLC0415

    def sessionize(
        key: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        user_id = key[0]
        closed: list[tuple[int, int, int, int, str]] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last, n, "timeout"))
                state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])
            return

        start, last, n = state.get if state.exists else (None, None, 0)
        ts_all: list[int] = []
        for pdf in batches:
            ts_all.extend(int(t) for t in pdf["ts"])
        for ts in sorted(ts_all):
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > gap_ns:
                closed.append((user_id, start, last, n, "gap"))
                start, last, n = ts, ts, 1
            else:
                last = ts
                n += 1
        if start is not None:
            state.update((start, last, n))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])

    return sessionize


def make_event_time_sessionizer(gap_ns: int = GAP_NS):
    """Event-time variant of the per-group function.

    The open session's close is scheduled at ``last_event + gap`` in EVENT
    time (``setTimeoutTimestamp``); the stream's watermark passing that
    instant fires the flush. Because the watermark progression is derived
    from the data, replaying the same input closes the same sessions at the
    same points — the processing-time variant's idle flushes depend on wall
    clock and are not reproducible.
    """
    import pandas as pd  # noqa: PLC0415

    def sessionize(
        key: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        user_id = key[0]
        closed: list[tuple[int, int, int, int, str]] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last, n, "watermark"))
                state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])
            return

        start, last, n = state.get if state.exists else (None, None, 0)
        ts_all: list[int] = []
        for pdf in batches:
            ts_all.extend(int(t) for t in pdf["ts"])
        for ts in sorted(ts_all):
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > gap_ns:
                closed.append((user_id, start, last, n, "gap"))
                start, last, n = ts, ts, 1
            else:
                last = ts
                n += 1
        if start is not None:
            state.update((start, last, n))
            # close at last+gap in event time; must stay above the current
            # watermark or the registration is rejected
            close_ms = (last + gap_ns) // 1_000_000
            state.setTimeoutTimestamp(max(close_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])

    return sessionize


def stream_sessionize_event_time(
    events: DataFrame,
    gap_ns: int = GAP_NS,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Event-time sessionization of a streaming (user_id, ts-nanos) frame:
    watermark on the event time, sessions closed by gap or by the watermark
    passing ``last + gap``. Deterministic under replay."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    with_time = events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return (
        with_time.withWatermark("event_time", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_event_time_sessionizer(gap_ns),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap_ns: int = GAP_NS,
    timeout_ms: int | None = 60_000,
) -> DataFrame:
    """Apply the stateful sessionizer to a streaming events DataFrame with
    columns (user_id long, ts long-nanos). Returns the stream of CLOSED
    sessions. Attach a writeStream sink + checkpoint to run."""
    conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_ns, timeout_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )
