"""Stateful streaming sessionization: state carries across micro-batches,
closed sessions emit exactly once."""

from __future__ import annotations

import pytest

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


def _write_batch(feed_dir, name, rows, mtime: int | None = None):
    p = feed_dir / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    if mtime is not None:
        # FileStreamSource orders by modification time; same-instant writes
        # would make batch order (and thus watermark-based late-data drops)
        # nondeterministic
        import os

        os.utime(p, (mtime, mtime))


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


@pytest.mark.full  # evidence lane (r13 split): recall/equivalence soak
def test_event_time_sessionize_replay_deterministic(spark, tmp_path):
    """Event-time variant: the watermark (data-derived) closes idle sessions,
    so two replays of the same feed emit IDENTICAL session sets — the
    determinism the processing-time timeout cannot give."""
    from sri2db_spark.streaming.sessionize import stream_sessionize_event_time

    minute = 60_000_000_000
    hour = 60 * minute
    feed = tmp_path / "feed"
    feed.mkdir()
    # b1: two users start sessions. b2: user 1 continues; user 2 idle.
    # b3: far-future activity of user 3 advances the max event time; the
    # watermark derived from it becomes effective in the NEXT batch, so b4
    # (any later data) is where the idle sessions of users 1 and 2 flush —
    # all of it driven by event time only.
    _write_batch(
        feed,
        "b1.json",
        [
            {"user_id": 1, "ts": BASE, "event_id": 1},
            {"user_id": 2, "ts": BASE + minute, "event_id": 2},
        ],
        mtime=1_000_000_001,
    )
    _write_batch(
        feed,
        "b2.json",
        [{"user_id": 1, "ts": BASE + 5 * minute, "event_id": 3}],
        mtime=1_000_000_002,
    )
    _write_batch(
        feed,
        "b3.json",
        [{"user_id": 3, "ts": BASE + 100 * hour, "event_id": 4}],
        mtime=1_000_000_003,
    )
    _write_batch(
        feed,
        "b4.json",
        [{"user_id": 3, "ts": BASE + 100 * hour + minute, "event_id": 5}],
        mtime=1_000_000_004,
    )

    def run(tag: str):
        out_dir = tmp_path / f"out_{tag}"
        ckpt = tmp_path / f"ckpt_{tag}"
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        sessions = stream_sessionize_event_time(stream, gap_ns=GAP_NS)
        q = (
            sessions.writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.read.schema(sessions.schema).parquet(str(out_dir)).collect()
        return sorted(
            (r.user_id, r.session_start_ns, r.session_end_ns, r.n_events, r.closed_by)
            for r in rows
        )

    first = run("a")
    second = run("b")
    assert first == second  # replay determinism
    closed_users = {u for u, *_ in first}
    assert {1, 2} <= closed_users  # both idle sessions flushed by watermark
    by_user = {u: cb for u, _, _, _, cb in first}
    assert by_user[1] == "watermark" and by_user[2] == "watermark"


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
