"""Stateful streaming sessionization: state carries across micro-batches,
closed sessions emit exactly once."""

from __future__ import annotations

import json
import time

from pyspark.sql import types as T

from sri2db_spark.streaming.sessionize import GAP_NS, stream_sessionize

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)

BASE = 1_700_000_000_000_000_000  # some epoch nanos


def _write_batch(feed_dir, name, rows):
    (feed_dir / name).write_text("\n".join(json.dumps(r) for r in rows))


def test_stateful_sessionize_across_batches(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    minute = 60_000_000_000
    # batch 1: user 1 has two events 5 min apart (one open session);
    #          user 2 has one event.
    _write_batch(
        feed,
        "b1.json",
        [
            {"user_id": 1, "ts": BASE, "event_id": 1},
            {"user_id": 1, "ts": BASE + 5 * minute, "event_id": 2},
            {"user_id": 2, "ts": BASE, "event_id": 3},
        ],
    )

    stream = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).json(
        str(feed)
    )
    sessions = stream_sessionize(stream, gap_ns=GAP_NS, timeout_ms=None)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    first = spark.read.schema(sessions.schema).parquet(str(out_dir)).collect()
    assert first == []  # sessions still open - nothing closed yet

    # batch 2: user 1 returns after a 31+5 min gap -> closes session 1 (2 events);
    # user 2 continues within the gap -> stays open.
    _write_batch(
        feed,
        "b2.json",
        [
            {"user_id": 1, "ts": BASE + 36 * minute + GAP_NS, "event_id": 4},
            {"user_id": 2, "ts": BASE + 10 * minute, "event_id": 5},
        ],
    )
    q2 = (
        stream_sessionize(
            spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).json(str(feed)),
            gap_ns=GAP_NS,
            timeout_ms=None,
        )
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    rows = spark.read.schema(sessions.schema).parquet(str(out_dir)).collect()
    assert len(rows) == 1
    s = rows[0]
    assert s.user_id == 1
    assert s.n_events == 2
    assert s.session_start_ns == BASE
    assert s.session_end_ns == BASE + 5 * minute
    assert s.closed_by == "gap"


def test_sessionizer_function_pure():
    """The per-group function is testable without a stream."""
    import pandas as pd

    from sri2db_spark.streaming.sessionize import make_sessionizer

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

        def setTimeoutDuration(self, ms):
            pass

    fn = make_sessionizer(gap_ns=100, timeout_ms=1000)
    state = FakeState()
    out = list(fn((7,), iter([pd.DataFrame({"ts": [0, 50, 300, 320, 900]})]), state))
    closed = pd.concat(out)
    # two gaps -> two closed sessions; third stays open in state
    assert list(closed["n_events"]) == [2, 2]
    assert state.get == (900, 900, 1)
    # timeout flushes the open session
    state.hasTimedOut = True
    out2 = pd.concat(list(fn((7,), iter([]), state)))
    assert list(out2["closed_by"]) == ["timeout"]
    assert not state.exists
