"""Event-time windowed streaming aggregation: windows finalize exactly once
when the watermark passes, and rows later than the delay are dropped — the
deterministic-under-replay contract a lake sink needs."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from sri2db_spark.streaming.windowed import windowed_counts

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


def _write_batch(feed_dir, name, rows, mtime: int):
    p = feed_dir / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    os.utime(p, (mtime, mtime))


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run_available():
        stream = spark.readStream.schema(EV_SCHEMA).json(str(feed))
        counts = windowed_counts(
            stream,
            "event_time",
            window_duration="5 minutes",
            watermark_delay="10 minutes",
        )
        q = (
            counts.writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return counts.schema

    _write_batch(
        feed,
        "b1.json",
        [
            {"event_id": 1, "event_time": "2024-01-01T10:00:10"},
            {"event_id": 2, "event_time": "2024-01-01T10:01:00"},
            {"event_id": 3, "event_time": "2024-01-01T10:06:00"},
            # pushes the watermark to 10:50 — both 10:0x windows close
            {"event_id": 4, "event_time": "2024-01-01T11:00:00"},
        ],
        mtime=1_000,
    )
    schema = run_available()
    rows = spark.read.schema(schema).parquet(str(out_dir)).collect()
    got = {str(r.window_start): r.n for r in rows}
    assert got["2024-01-01 10:00:00"] == 2
    assert got["2024-01-01 10:05:00"] == 1
    # the 11:00 window hasn't finalized (watermark never passed 11:05):
    # append mode holds it back — exactly-once, not speculative
    assert "2024-01-01 11:00:00" not in got

    # a restart from the checkpoint restores watermark state; a row older
    # than the watermark arrives -> dropped, the already-emitted 10:00
    # window must NOT re-emit or change
    _write_batch(
        feed,
        "b2.json",
        [{"event_id": 5, "event_time": "2024-01-01T10:02:00"}],
        mtime=2_000,
    )
    run_available()
    rows = spark.read.schema(schema).parquet(str(out_dir)).collect()
    got2 = sorted((str(r.window_start), r.n) for r in rows)
    assert got2 == [("2024-01-01 10:00:00", 2), ("2024-01-01 10:05:00", 1)]
