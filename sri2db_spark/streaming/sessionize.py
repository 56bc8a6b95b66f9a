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
