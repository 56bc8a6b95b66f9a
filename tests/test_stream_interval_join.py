"""Stream-stream interval join: clicks attribute to the impression they
followed within the interval; out-of-interval clicks never match; state is
watermark-bounded so the join is replay-deterministic."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from sri2db_spark.streaming.interval_join import stream_interval_join

IMP_SCHEMA = T.StructType(
    [
        T.StructField("imp_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
CLICK_SCHEMA = T.StructType(
    [
        T.StructField("click_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _feed(d, name, rows, mtime: int):
    p = d / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    os.utime(p, (mtime, mtime))


def test_clicks_attribute_within_interval(spark, tmp_path):
    imp_dir = tmp_path / "imp"
    click_dir = tmp_path / "click"
    imp_dir.mkdir()
    click_dir.mkdir()
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    _feed(
        imp_dir,
        "i1.json",
        [
            {"imp_id": 1, "user_id": 7, "ts": "2024-01-01T10:00:00"},
            {"imp_id": 2, "user_id": 8, "ts": "2024-01-01T10:00:00"},
            {"imp_id": 3, "user_id": 7, "ts": "2024-01-01T11:00:00"},
        ],
        mtime=1_000,
    )
    _feed(
        click_dir,
        "c1.json",
        [
            # within 10 min of imp 1 (same user) -> matches imp 1 only
            {"click_id": 100, "user_id": 7, "ts": "2024-01-01T10:05:00"},
            # 30 min after imp 2 -> outside the interval, no match
            {"click_id": 101, "user_id": 8, "ts": "2024-01-01T10:30:00"},
            # 1 min after imp 3 -> matches imp 3 (not the stale imp 1)
            {"click_id": 102, "user_id": 7, "ts": "2024-01-01T11:01:00"},
        ],
        mtime=1_000,
    )

    imps = spark.readStream.schema(IMP_SCHEMA).json(str(imp_dir))
    clicks = spark.readStream.schema(CLICK_SCHEMA).json(str(click_dir))
    joined = stream_interval_join(
        imps, clicks, key="user_id", left_time="ts", right_time="ts", upper="10 minutes"
    )
    q = (
        joined.select("l_imp_id", "r_click_id")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.read.parquet(str(out_dir)).collect()
    got = sorted((r.l_imp_id, r.r_click_id) for r in rows)
    assert got == [(1, 100), (3, 102)]


def test_state_bounded_join_is_replay_deterministic(spark, tmp_path):
    """Re-running from the same checkpoint with a late (beyond-watermark)
    click must not produce new matches — evicted state stays evicted."""
    imp_dir = tmp_path / "imp"
    click_dir = tmp_path / "click"
    imp_dir.mkdir()
    click_dir.mkdir()
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run():
        imps = spark.readStream.schema(IMP_SCHEMA).json(str(imp_dir))
        clicks = spark.readStream.schema(CLICK_SCHEMA).json(str(click_dir))
        joined = stream_interval_join(
            imps, clicks, key="user_id", left_time="ts", right_time="ts",
            upper="10 minutes", watermark_delay="5 minutes",
        )
        q = (
            joined.select("l_imp_id", "r_click_id")
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _feed(
        imp_dir, "i1.json",
        [{"imp_id": 1, "user_id": 7, "ts": "2024-01-01T10:00:00"},
         # advances both watermarks far past imp 1's interval
         {"imp_id": 9, "user_id": 1, "ts": "2024-01-01T12:00:00"}],
        mtime=1_000,
    )
    _feed(
        click_dir, "c1.json",
        [{"click_id": 100, "user_id": 7, "ts": "2024-01-01T10:01:00"},
         {"click_id": 900, "user_id": 1, "ts": "2024-01-01T12:00:30"}],
        mtime=1_000,
    )
    run()
    n1 = spark.read.parquet(str(out_dir)).count()

    # a click for imp 1 arriving after the watermark passed its interval:
    # state for imp 1 is gone -> no new match may appear
    _feed(
        click_dir, "c2.json",
        [{"click_id": 101, "user_id": 7, "ts": "2024-01-01T10:02:00"}],
        mtime=2_000,
    )
    run()
    rows = spark.read.parquet(str(out_dir)).collect()
    assert len(rows) == n1
    assert sorted((r.l_imp_id, r.r_click_id) for r in rows) == [(1, 100), (9, 900)]
