"""Streaming ingest into the Z-ordered skipping layer
(streaming/zorder_ingest.stream_zordered_ingest): micro-batches append as
generations, scans prune across them, replay never duplicates, and
compaction mid-stream preserves the replay mark."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from sri2db_spark.functions.layout import (
    compact_zordered,
    read_skipping,
)
from sri2db_spark.sinks.committer import ManifestCommitter
from sri2db_spark.streaming.zorder_ingest import STREAM_HWM, stream_zordered_ingest

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def _write_feed(feed_dir, name, rows, mtime):
    p = feed_dir / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    os.utime(p, (mtime, mtime))


def _rows(lo, hi):
    return [
        {"event_id": i, "user_id": i % 50, "ts_ms": 1_700_000_000_000 + i}
        for i in range(lo, hi)
    ]


def test_stream_zordered_ingest_appends_prunes_and_survives_replay(
    spark, tmp_path
):
    feed = tmp_path / "feed"
    feed.mkdir()
    _write_feed(feed, "b0.json", _rows(0, 100), 1_000)
    _write_feed(feed, "b1.json", _rows(100, 200), 2_000)
    table = str(tmp_path / "zt")
    mc = ManifestCommitter()

    def run(ckpt):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        q = stream_zordered_ingest(
            stream, table, ["event_id", "ts_ms"], str(tmp_path / ckpt), mc,
            n_files=2,
        )
        q.awaitTermination(120)

    run("ck1")
    total = read_skipping(spark, table, {"event_id": (None, None)}, committer=mc)
    assert total.count() == 200
    # the mark is the last applied batch id, committed with the data
    base = mc.resolve(table)
    assert open(os.path.join(base, STREAM_HWM)).read() == "1"
    # generation-pruned scan: an early range reads only batch-0 files
    early = read_skipping(spark, table, {"event_id": (10, 20)}, committer=mc)
    assert sorted(r.event_id for r in early.collect()) == list(range(10, 21))
    assert len(early.inputFiles()) <= 2

    # replay from a FRESH checkpoint (batch ids restart at 0): the
    # high-water mark skips both batches — no duplicates
    run("ck2")
    assert (
        read_skipping(
            spark, table, {"event_id": (None, None)}, committer=mc
        ).count()
        == 200
    )

    # a NEW file continues the stream on the original checkpoint
    _write_feed(feed, "b2.json", _rows(200, 250), 3_000)
    run("ck1")
    assert (
        read_skipping(
            spark, table, {"event_id": (None, None)}, committer=mc
        ).count()
        == 250
    )
    assert open(os.path.join(mc.resolve(table), STREAM_HWM)).read() == "2"


def test_compaction_preserves_stream_mark(spark, tmp_path):
    """zorder-compact mid-stream must carry the _STREAM_BATCH sidecar into
    its merged version: dropping it would make a checkpoint-reset replay
    double-apply every batch after the compaction."""
    feed = tmp_path / "feed"
    feed.mkdir()
    # overlapping event_id ranges so the generations actually merge
    _write_feed(feed, "b0.json", _rows(0, 100), 1_000)
    _write_feed(feed, "b1.json", _rows(0, 100), 2_000)
    _write_feed(feed, "b2.json", _rows(0, 100), 3_000)
    table = str(tmp_path / "zt")
    mc = ManifestCommitter()
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = stream_zordered_ingest(
        stream, table, ["event_id", "ts_ms"], str(tmp_path / "ck"), mc,
        n_files=2,
    )
    q.awaitTermination(120)
    assert (
        read_skipping(
            spark, table, {"event_id": (None, None)}, committer=mc
        ).count()
        == 300
    )

    rep = compact_zordered(spark, table, committer=mc, min_depth=3)
    assert rep["committed"]
    base = mc.resolve(table)
    assert open(os.path.join(base, STREAM_HWM)).read() == "2"
    # reads unchanged; a fresh-checkpoint replay after compaction still
    # skips every already-applied batch
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q2 = stream_zordered_ingest(
        stream2, table, ["event_id", "ts_ms"], str(tmp_path / "ck_fresh"), mc,
        n_files=2,
    )
    q2.awaitTermination(120)
    assert (
        read_skipping(
            spark, table, {"event_id": (None, None)}, committer=mc
        ).count()
        == 300
    )


def test_every_writer_carries_the_stream_mark(spark, tmp_path):
    """Not just compaction: a plain batch append_zordered (no markers) and
    a full write_zordered re-cluster must carry _STREAM_* sidecars into
    their new versions — a version without the mark would make the next
    checkpoint-reset replay double-apply every batch."""
    from pyspark.sql import functions as F

    from sri2db_spark.functions.layout import append_zordered, write_zordered

    feed = tmp_path / "feed"
    feed.mkdir()
    _write_feed(feed, "b0.json", _rows(0, 100), 1_000)
    table = str(tmp_path / "zt")
    mc = ManifestCommitter()
    stream = spark.readStream.schema(SCHEMA).json(str(feed))
    q = stream_zordered_ingest(
        stream, table, ["event_id", "ts_ms"], str(tmp_path / "ck"), mc,
    )
    q.awaitTermination(120)
    assert open(os.path.join(mc.resolve(table), STREAM_HWM)).read() == "0"

    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("event_id"),
        (F.col("id") % 50).alias("user_id"),
        (F.lit(1_700_000_000_000) + F.col("id")).alias("ts_ms"),
    ).select("event_id", "ts_ms")

    # batch append without markers: mark carried
    append_zordered(
        mk(1000, 1100), table, ["event_id", "ts_ms"], 1, committer=mc
    )
    assert open(os.path.join(mc.resolve(table), STREAM_HWM)).read() == "0"

    # full re-cluster: mark carried
    allrows = read_skipping(
        spark, table, {"event_id": (None, None)}, committer=mc
    ).localCheckpoint()
    write_zordered(allrows, table, ["event_id", "ts_ms"], 2, committer=mc)
    assert open(os.path.join(mc.resolve(table), STREAM_HWM)).read() == "0"

    # a fresh-checkpoint replay after both writers still skips batch 0
    stream2 = spark.readStream.schema(SCHEMA).json(str(feed))
    q2 = stream_zordered_ingest(
        stream2, table, ["event_id", "ts_ms"], str(tmp_path / "ck2"), mc,
    )
    q2.awaitTermination(120)
    assert (
        read_skipping(
            spark, table, {"event_id": (None, None)}, committer=mc
        ).count()
        == 200
    )


def test_ingest_rejects_zero_retries(spark, tmp_path):
    import pytest

    from sri2db_spark.sinks.committer import RenameCommitter

    stream = spark.readStream.schema(SCHEMA).json(str(tmp_path))
    with pytest.raises(ValueError, match="max_commit_retries"):
        stream_zordered_ingest(
            stream, str(tmp_path / "t"), ["event_id"], str(tmp_path / "c"),
            ManifestCommitter(), max_commit_retries=0,
        )
    with pytest.raises(ValueError, match="ManifestCommitter"):
        stream_zordered_ingest(
            stream, str(tmp_path / "t"), ["event_id"], str(tmp_path / "c"),
            RenameCommitter(),
        )
    # a '/' would nest the sidecar where the listdir-based carry never
    # sees it — the mark silently vanishes at the next commit
    for bad in ("tenant/a", "", "a b"):
        with pytest.raises(ValueError, match="stream_id"):
            stream_zordered_ingest(
                stream, str(tmp_path / "t"), ["event_id"],
                str(tmp_path / "c"), ManifestCommitter(), stream_id=bad,
            )


def test_two_streams_one_table_with_distinct_stream_ids(spark, tmp_path):
    """Two independent streams feeding one table must keep independent
    replay marks (stream_id namespaces _STREAM_BATCH.<id>): both streams'
    data lands, both marks survive each other's commits, and a fresh-
    checkpoint replay of EITHER stream skips its own batches only."""
    feed_a, feed_b = tmp_path / "fa", tmp_path / "fb"
    feed_a.mkdir()
    feed_b.mkdir()
    _write_feed(feed_a, "a0.json", _rows(0, 100), 1_000)
    _write_feed(feed_b, "b0.json", _rows(1000, 1100), 1_000)
    table = str(tmp_path / "zt")
    mc = ManifestCommitter()

    def run(feed, ckpt, sid):
        stream = spark.readStream.schema(SCHEMA).json(str(feed))
        q = stream_zordered_ingest(
            stream, table, ["event_id", "ts_ms"], str(tmp_path / ckpt), mc,
            stream_id=sid,
        )
        q.awaitTermination(120)

    run(feed_a, "cka", "a")
    run(feed_b, "ckb", "b")
    base = mc.resolve(table)
    assert open(os.path.join(base, f"{STREAM_HWM}.a")).read() == "0"
    assert open(os.path.join(base, f"{STREAM_HWM}.b")).read() == "0"
    assert (
        read_skipping(
            spark, table, {"event_id": (None, None)}, committer=mc
        ).count()
        == 200
    )

    # fresh-checkpoint replays: each stream skips only its own batch 0
    run(feed_a, "cka2", "a")
    run(feed_b, "ckb2", "b")
    assert (
        read_skipping(
            spark, table, {"event_id": (None, None)}, committer=mc
        ).count()
        == 200
    )


def test_doctor_reports_stream_marks(spark, tmp_path):
    from sri2db_spark.functions import doctor as D

    feed = tmp_path / "feed"
    feed.mkdir()
    _write_feed(feed, "b0.json", _rows(0, 50), 1_000)
    table = str(tmp_path / "zt")
    mc = ManifestCommitter()
    stream = spark.readStream.schema(SCHEMA).json(str(feed))
    q = stream_zordered_ingest(
        stream, table, ["event_id", "ts_ms"], str(tmp_path / "ck"), mc,
        stream_id="ingest-a",
    )
    q.awaitTermination(120)
    rep = D.check_versioned_store(table, committer=mc)
    assert rep["healthy"], rep["issues"]
    assert rep["info"]["stream_marks"] == {
        f"{STREAM_HWM}.ingest-a": "0",
        STREAM_HWM: "-1",  # tombstoned legacy mark
    }


def test_new_suffixed_stream_on_legacy_table_raises(spark, tmp_path):
    """A brand-new suffixed stream pointed at a never-migrated legacy table
    must NOT silently adopt the legacy _STREAM_BATCH as its own high-water
    mark (it would skip its first N batches — data loss); inheritance is
    opt-in and the default raises (ADVICE r8)."""
    import pytest

    feed = tmp_path / "feed"
    feed.mkdir()
    _write_feed(feed, "b0.json", _rows(0, 100), 1_000)
    table = str(tmp_path / "zt")
    mc = ManifestCommitter()

    def run(ckpt, src=feed, **kw):
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = stream_zordered_ingest(
            stream, table, ["event_id", "ts_ms"], str(tmp_path / ckpt), mc, **kw
        )
        q.awaitTermination(120)

    run("ck-legacy")  # unsuffixed legacy stream commits mark "0"
    # a NEW suffixed stream with a fresh checkpoint: its batch 0 is NEW data,
    # but the legacy mark says 0-already-applied — must raise, not skip
    _write_feed(feed, "b1.json", _rows(100, 150), 2_000)
    with pytest.raises(Exception, match="inherit_legacy_mark"):
        run("ck-new", stream_id="new-stream")
    # opting in (the renamed-legacy-stream case: SAME checkpoint dir, new
    # stream_id) reads the legacy mark, skips the replayed batch ids
    # at-or-under it, applies the new batch, and tombstones the legacy mark
    run("ck-legacy", stream_id="migrated", inherit_legacy_mark=True)
    got = read_skipping(spark, table, {"event_id": (None, None)}, committer=mc)
    assert got.count() == 150
    base = mc.resolve(table)
    assert open(os.path.join(base, STREAM_HWM)).read() == "-1"
    assert open(os.path.join(base, f"{STREAM_HWM}.migrated")).read() == "1"
    # an unrelated suffixed stream (its own feed) now starts cleanly
    # against the tombstone — no raise, no skipped first batch
    feed2 = tmp_path / "feed2"
    feed2.mkdir()
    _write_feed(feed2, "b2.json", _rows(150, 170), 3_000)
    run("ck-other", src=feed2, stream_id="other")
    got = read_skipping(spark, table, {"event_id": (None, None)}, committer=mc)
    assert got.count() == 170


def test_inherit_legacy_mark_requires_stream_id(spark, tmp_path):
    import pytest

    stream = spark.readStream.schema(SCHEMA).json(str(tmp_path))
    with pytest.raises(ValueError, match="inherit_legacy_mark"):
        stream_zordered_ingest(
            stream, str(tmp_path / "t"), ["event_id"], str(tmp_path / "c"),
            ManifestCommitter(), inherit_legacy_mark=True,
        )
