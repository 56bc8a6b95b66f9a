"""Streaming dedup: first-arrival-wins across micro-batches, state bounded
by the event-time watermark."""

from __future__ import annotations

import pytest

import json
import os

from pyspark.sql import types as T

from sri2db_spark.streaming.dedup_stream import (
    stream_exact_dedup,
    stream_exact_dedup_global,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


def _write_batch(feed_dir, name, rows, mtime: int):
    p = feed_dir / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    # FileStreamSource orders by modification time; pin it so batch order
    # is deterministic
    os.utime(p, (mtime, mtime))


def test_stream_dedup_across_batches(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    _write_batch(
        feed,
        "b1.json",
        [
            {"doc_id": 1, "text": "alpha", "event_time": "2024-01-01T10:00:00"},
            {"doc_id": 2, "text": "alpha", "event_time": "2024-01-01T10:00:30"},
            {"doc_id": 3, "text": "beta", "event_time": "2024-01-01T10:01:00"},
        ],
        mtime=1_000,
    )
    # duplicate arrives in a LATER micro-batch but inside the watermark
    # window -> state must carry across batches and drop it
    _write_batch(
        feed,
        "b2.json",
        [
            {"doc_id": 4, "text": "alpha", "event_time": "2024-01-01T10:02:00"},
            {"doc_id": 5, "text": "gamma", "event_time": "2024-01-01T10:02:30"},
        ],
        mtime=2_000,
    )

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    deduped = stream_exact_dedup(
        stream, "text", "event_time", watermark_delay="10 minutes"
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.read.schema(deduped.schema).parquet(str(out_dir)).collect()
    kept = sorted(r.doc_id for r in rows)
    assert kept == [1, 3, 5]  # docs 2 and 4 are content-duplicates of 1
    assert len({r.content_hash for r in rows}) == 3


def test_stream_dedup_global_finite_feed(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    _write_batch(
        feed,
        "b1.json",
        [
            {"doc_id": 1, "text": "x", "event_time": "2024-01-01T00:00:00"},
            {"doc_id": 2, "text": "x", "event_time": "2024-01-01T00:00:01"},
            {"doc_id": 3, "text": "y", "event_time": "2024-01-01T00:00:02"},
        ],
        mtime=1_000,
    )
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(feed))
    deduped = stream_exact_dedup_global(stream, "text")
    out_dir, ckpt = tmp_path / "out2", tmp_path / "ckpt2"
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.read.schema(deduped.schema).parquet(str(out_dir)).collect()
    assert sorted(r.doc_id for r in rows) == [1, 3]


def test_stream_neardup_against_static_index(spark, tmp_path):
    """Arriving docs that near-duplicate the standing corpus are dropped
    mid-stream; novel docs survive to the parquet sink."""
    from sri2db_spark.functions.dedup import build_lsh_index
    from sri2db_spark.streaming.dedup_stream import stream_neardup_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(100, base), (101, "completely different reference material here for the index")],
        "doc_id long, text string",
    )
    bands_df, shingles_df = build_lsh_index(corpus, "doc_id", "text")

    feed = tmp_path / "nfeed"
    feed.mkdir()
    _write_batch(
        feed,
        "b1.json",
        [
            # near-identical to doc 100 (one word changed) -> dropped
            {"doc_id": 1, "text": base.replace("lazy", "sleepy"),
             "event_time": "2024-01-01T10:00:00"},
            # novel -> survives
            {"doc_id": 2, "text": "a totally novel document about spark physical plans",
             "event_time": "2024-01-01T10:00:30"},
        ],
        mtime=1_000,
    )
    stream = (
        spark.readStream.schema(DOC_SCHEMA).json(str(feed)).select("doc_id", "text")
    )
    q = stream_neardup_dedup(
        stream, bands_df, shingles_df,
        str(tmp_path / "nout"), str(tmp_path / "nckpt"),
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(str(tmp_path / "nout")).collect()}
    assert got == {2}


def test_stream_neardup_dedup_replay_does_not_double_append(spark, tmp_path):
    """Exactly-once for the stream-vs-static wrapper: survivors are
    batch-id-addressed with overwrite, so a REPLAYED batch (checkpoint
    lost, same feed reprocessed with the same batch ids) replaces its own
    output instead of double-appending every survivor."""
    import shutil

    from sri2db_spark.functions.dedup import build_lsh_index
    from sri2db_spark.streaming.dedup_stream import stream_neardup_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(100, base)], "doc_id long, text string"
    )
    bands_df, shingles_df = build_lsh_index(corpus, "doc_id", "text")
    feed = tmp_path / "rfeed"
    feed.mkdir()
    _write_batch(
        feed,
        "b1.json",
        [
            {"doc_id": 1, "text": "a totally novel document about query planners",
             "event_time": "2024-01-01T10:00:00"},
            {"doc_id": 2, "text": "another novel text on columnar storage layouts",
             "event_time": "2024-01-01T10:00:30"},
        ],
        mtime=1_000,
    )
    out, ckpt = str(tmp_path / "rout"), str(tmp_path / "rckpt")

    def run():
        stream = (
            spark.readStream.schema(DOC_SCHEMA).json(str(feed))
            .select("doc_id", "text")
        )
        q = stream_neardup_dedup(stream, bands_df, shingles_df, out, ckpt)
        q.awaitTermination(120)

    run()
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == [1, 2]
    # checkpoint lost → the whole feed REPLAYS with the same batch ids
    shutil.rmtree(ckpt)
    run()
    replay = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert replay == first  # overwritten in place, NOT double-appended


def test_compact_batch_output_folds_history_preserves_newest(spark, tmp_path):
    """compact_batch_output folds committed-history batch dirs into one
    negative-token base, preserves the replay-protected newest batch as a
    batch dir, loses no rows, and the folded layout still reads through
    both plain and basePath readers."""
    from sri2db_spark.functions.pipeline import compact_batch_output

    out = str(tmp_path / "bout")
    for b in range(4):
        spark.createDataFrame(
            [(b * 10 + i, f"doc {b}-{i}") for i in range(3)],
            "doc_id long, text string",
        ).write.mode("overwrite").parquet(f"{out}/batch_id={b}")
    all_ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    before, after = compact_batch_output(spark, out, keys=["doc_id"])
    assert before > after >= 1
    import os

    assert os.path.isdir(f"{out}/batch_id=3")  # replay-protected, untouched
    assert os.path.isdir(f"{out}/batch_id=-1")  # the folded base
    assert not os.path.isdir(f"{out}/batch_id=0")
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == all_ids  # nothing lost
    # the basePath + batch_id-exclusion read the incremental wrappers use
    df = spark.read.option("basePath", out).parquet(out)
    live = df.filter("batch_id != 3")
    assert {r.doc_id for r in live.collect()} == all_ids - {30, 31, 32}
    # a replay of the protected batch overwrites its own dir — no dups
    spark.createDataFrame(
        [(30 + i, f"doc 3-{i}") for i in range(3)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(f"{out}/batch_id=3")
    assert spark.read.parquet(out).count() == len(all_ids)
    # a second compaction is a no-op (base + protected only)
    b2, a2 = compact_batch_output(spark, out, keys=["doc_id"])
    assert b2 == a2


@pytest.mark.full  # evidence lane (r13 split): multi-batch chain/replay soak
def test_stream_neardup_incremental_maintains_store(spark, tmp_path):
    """Self-maintaining streaming near-dup: cross-batch pairs surface in the
    batch where the LATER member arrives, the signature store accumulates
    every doc once, and the union of per-batch pairs equals the batch
    algorithm run on the whole corpus at rest."""
    from sri2db_spark.functions import dedup as D
    from sri2db_spark.streaming.dedup_stream import stream_neardup_incremental

    t_dup = "the quick brown fox jumps over the lazy dog again and again"
    t_other = "completely different content about spark structured streaming state"
    rows1 = [
        {"doc_id": 1, "text": t_dup, "event_time": "2024-01-01T10:00:00"},
        {"doc_id": 2, "text": t_dup + " extra", "event_time": "2024-01-01T10:00:10"},
        {"doc_id": 3, "text": t_other, "event_time": "2024-01-01T10:00:20"},
    ]
    rows2 = [
        {"doc_id": 4, "text": t_dup, "event_time": "2024-01-01T10:05:00"},
        {"doc_id": 5, "text": "yet more unrelated words entirely", "event_time": "2024-01-01T10:05:10"},
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    _write_batch(feed, "b1.json", rows1, mtime=1_000)
    store = str(tmp_path / "store")
    corpus = str(tmp_path / "corpus")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def run_available():
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        q = stream_neardup_incremental(
            stream, store, corpus, pairs_dir, ckpt,
        )
        q.awaitTermination(120)

    run_available()
    _write_batch(feed, "b2.json", rows2, mtime=2_000)
    run_available()

    all_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows1 + rows2], "doc_id long, text string"
    )
    expected = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(all_docs, "doc_id", "text").collect()
    }
    got_rows = spark.read.option("basePath", pairs_dir).parquet(pairs_dir).collect()
    got = {(r.id_a, r.id_b) for r in got_rows}
    assert got == expected
    assert len(got_rows) == len(got)  # each pair exactly once across batches
    assert (1, 4) in got or (4, 1) in got  # a cross-batch pair was found
    # the (4, ...) pairs surfaced in doc 4's batch, not doc 1's
    later = {(r.id_a, r.id_b) for r in got_rows if r.id_b == 4 or r.id_a == 4}
    for p in later:
        assert p in expected
    # store holds every doc's signature exactly once
    sigs = spark.read.option("basePath", store).parquet(store)
    assert sorted(r.id for r in sigs.select("id").collect()) == [1, 2, 3, 4, 5]


@pytest.mark.full  # evidence lane (r13 split): recall/equivalence soak
def test_stream_curate_incremental_matches_batch_chain(spark, tmp_path):
    """The streaming curation wrapper must produce exactly what chained
    manual curate_batch_incremental calls produce, and the state must carry
    across micro-batches (a batch-2 near-dup of a batch-1 survivor drops)."""
    from sri2db_spark.functions import pipeline as P
    from sri2db_spark.streaming.dedup_stream import stream_curate_incremental

    nat = ("the quick brown fox jumps over the lazy dog while the rain in "
           "spain falls mainly on the plain and the cat sat on the mat")
    nat2 = ("a completely different natural sentence about spark and the art "
            "of distributed systems where the shuffle is the enemy of the "
            "fast query")
    rows1 = [
        {"doc_id": 10, "text": nat, "lang": "en"},
        {"doc_id": 11, "text": nat + " with one extra clause", "lang": "en"},
    ]
    rows2 = [
        {"doc_id": 20, "text": nat, "lang": "en"},   # exact dup of b1 survivor
        {"doc_id": 21, "text": nat2, "lang": "en"},  # fresh survivor
    ]
    feed = tmp_path / "cfeed"
    feed.mkdir()
    _write_batch(feed, "b1.json", rows1, mtime=1_000)
    bench = spark.createDataFrame(
        [(999, "benchmark secret sauce phrase entirely unique here", "en")],
        "doc_id long, text string, lang string",
    )
    schema = "doc_id long, text string, lang string"
    state = str(tmp_path / "cstate")
    out_dir = str(tmp_path / "cout")
    ckpt = str(tmp_path / "cckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        q = stream_curate_incremental(stream, state, out_dir, ckpt, bench)
        q.awaitTermination(120)

    run()
    _write_batch(feed, "b2.json", rows2, mtime=2_000)
    run()
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    # manual chain on a fresh state
    state2 = str(tmp_path / "cstate2")
    b1 = spark.createDataFrame([(r["doc_id"], r["text"], r["lang"]) for r in rows1], schema)
    b2 = spark.createDataFrame([(r["doc_id"], r["text"], r["lang"]) for r in rows2], schema)
    m1 = {r.doc_id for r in P.curate_batch_incremental(spark, b1, state2, bench).collect()}
    m2 = {r.doc_id for r in P.curate_batch_incremental(spark, b2, state2, bench).collect()}
    assert got == m1 | m2
    assert 10 in got and 21 in got and 20 not in got and 11 not in got


@pytest.mark.full  # evidence lane (r13 split): multi-batch chain/replay soak
def test_curate_incremental_replay_does_not_lose_docs(spark, tmp_path):
    """foreachBatch replay scenario: a batch's state append lands, the batch
    crashes, and the whole batch re-runs with the same batch id. With
    batch-token-addressed state the replay must (a) NOT anti-join its docs
    against their own first-attempt hashes (which would silently drop them
    from the curated corpus forever) and (b) leave each survivor in the
    state exactly once."""
    from sri2db_spark.functions import pipeline as P
    from sri2db_spark.functions.statestore import read_store

    nat = ("the quick brown fox jumps over the lazy dog while the rain in "
           "spain falls mainly on the plain and the cat sat on the mat")
    nat2 = ("a completely different natural sentence about spark and the art "
            "of distributed systems where the shuffle is the enemy of the "
            "fast query")
    schema = "doc_id long, text string, lang string"
    bench = spark.createDataFrame(
        [(999, "benchmark secret sauce phrase entirely unique here", "en")],
        schema,
    )
    state = str(tmp_path / "rstate")
    b1 = spark.createDataFrame([(10, nat, "en"), (11, nat2, "en")], schema)

    first = {
        r.doc_id
        for r in P.curate_batch_incremental(
            spark, b1, state, bench, batch_token=0
        ).collect()
    }
    assert first == {10, 11}
    # replay of the SAME batch id — simulates crash-after-state-append
    replay = {
        r.doc_id
        for r in P.curate_batch_incremental(
            spark, b1, state, bench, batch_token=0
        ).collect()
    }
    assert replay == first  # docs NOT dropped against their own state
    sig_ids = sorted(
        r.id for r in read_store(spark, f"{state}/sigs").select("id").collect()
    )
    assert sig_ids == [10, 11]  # each survivor's signature exactly once
    hashes = read_store(spark, f"{state}/hashes").collect()
    assert len(hashes) == len({r.h for r in hashes}) == 2
    # a LATER batch still sees batch-0 state: exact dup of doc 10 drops
    b2 = spark.createDataFrame([(20, nat, "en")], schema)
    out2 = P.curate_batch_incremental(
        spark, b2, state, bench, batch_token=1
    ).collect()
    assert out2 == []


@pytest.mark.full  # evidence lane (r13 split): multi-batch chain/replay soak
def test_compaction_preserves_replayable_batch(spark, tmp_path):
    """Crash → quiesce → compact → restart: the newest batch's state dir
    must survive compaction AS a batch_id dir, or the replay's
    current-token path exclusion misses the first attempt's rows (now
    flat) and the batch anti-joins its own documents out of the output."""
    from sri2db_spark.functions import pipeline as P
    from sri2db_spark.functions.statestore import read_store

    nat = ("the quick brown fox jumps over the lazy dog while the rain in "
           "spain falls mainly on the plain and the cat sat on the mat")
    nat2 = ("a completely different natural sentence about spark and the art "
            "of distributed systems where the shuffle is the enemy of the "
            "fast query")
    schema = "doc_id long, text string, lang string"
    bench = spark.createDataFrame(
        [(999, "benchmark secret sauce phrase entirely unique here", "en")],
        schema,
    )
    state = str(tmp_path / "cstate")
    b0 = spark.createDataFrame([(10, nat, "en")], schema)
    b1 = spark.createDataFrame([(11, nat2, "en")], schema)
    out0 = P.curate_batch_incremental(
        spark, b0, state, bench, batch_token=0
    ).collect()
    assert {r.doc_id for r in out0} == {10}
    # batch 1's state write lands, then the batch "crashes" (output lost)
    out1 = P.curate_batch_incremental(
        spark, b1, state, bench, batch_token=1
    ).collect()
    assert {r.doc_id for r in out1} == {11}
    # maintenance window: operator compacts the quiesced state
    import os

    P.compact_curation_state(spark, state)
    assert os.path.isdir(f"{state}/hashes/batch_id=1")  # newest preserved
    assert not os.path.isdir(f"{state}/hashes/batch_id=0")  # history folded
    # restart: batch 1 replays with the same token — docs must survive
    replay = P.curate_batch_incremental(
        spark, b1, state, bench, batch_token=1
    ).collect()
    assert {r.doc_id for r in replay} == {11}
    sig_ids = sorted(r.id for r in read_store(spark, f"{state}/sigs").collect())
    assert sig_ids == [10, 11]


def test_curate_incremental_mixed_flat_and_token_state(spark, tmp_path):
    """Bootstrap state written flat (init_curation_state) must coexist with
    batch-token-addressed appends, and compaction must collapse both."""
    from sri2db_spark.functions import pipeline as P
    from sri2db_spark.functions.statestore import read_store

    nat = ("the quick brown fox jumps over the lazy dog while the rain in "
           "spain falls mainly on the plain and the cat sat on the mat")
    nat2 = ("a completely different natural sentence about spark and the art "
            "of distributed systems where the shuffle is the enemy of the "
            "fast query")
    schema = "doc_id long, text string, lang string"
    bench = spark.createDataFrame(
        [(999, "benchmark secret sauce phrase entirely unique here", "en")],
        schema,
    )
    state = str(tmp_path / "mstate")
    seed = spark.createDataFrame([(1, nat, "en")], schema)
    P.init_curation_state(seed, state)
    b1 = spark.createDataFrame([(10, nat, "en"), (11, nat2, "en")], schema)
    out = {
        r.doc_id
        for r in P.curate_batch_incremental(
            spark, b1, state, bench, batch_token=7
        ).collect()
    }
    assert out == {11}  # 10 is an exact dup of the flat-bootstrapped doc 1
    ids = sorted(r.id for r in read_store(spark, f"{state}/sigs").collect())
    assert ids == [1, 11]
    rep = P.compact_curation_state(spark, state)
    assert set(rep) == {"hashes", "sigs", "corpus"}
    ids_after = sorted(r.id for r in read_store(spark, f"{state}/sigs").collect())
    assert ids_after == [1, 11]
    # retraction removes doc 11 everywhere; doc 1's hash survives
    P.retract_from_state(spark, state, [11])
    assert sorted(
        r.id for r in read_store(spark, f"{state}/corpus").collect()
    ) == [1]
    assert read_store(spark, f"{state}/hashes").count() == 1


def test_batch_addressed_stream_rejects_legacy_flat_output_dir(spark, tmp_path):
    """An out_dir still holding the pre-batch-addressed FLAT layout must be
    rejected at stream start: spark.read.parquet over a mix of root files
    and batch_id=* subdirs returns ONLY the root files, silently hiding
    every new survivor. The guard forces the documented migration
    (output-compact) first."""
    import pytest

    from sri2db_spark.functions.dedup import build_lsh_index
    from sri2db_spark.streaming.dedup_stream import stream_neardup_dedup

    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog once more")],
        "doc_id long, text string",
    )
    bands_df, shingles_df = build_lsh_index(corpus, "doc_id", "text")
    out = tmp_path / "legacy_out"
    # legacy layout: flat parquet at the output root
    spark.createDataFrame([(7, "old appended survivor")], "doc_id long, text string").write.mode("overwrite").parquet(str(out))
    feed = tmp_path / "gfeed"
    feed.mkdir()
    _write_batch(feed, "b1.json", [{"doc_id": 1, "text": "x", "event_time": "2024-01-01T10:00:00"}], mtime=1_000)
    stream = (
        spark.readStream.schema(DOC_SCHEMA).json(str(feed)).select("doc_id", "text")
    )
    with pytest.raises(ValueError, match="output-compact"):
        stream_neardup_dedup(
            stream, bands_df, shingles_df, str(out), str(tmp_path / "gckpt")
        )


def test_compact_batch_output_migrates_flat_only_dir(spark, tmp_path):
    """The migration remedy itself must work on a dir holding ONLY legacy
    flat files (no batch_id=* subdirs at all): they fold into a
    batch-addressed base (batch_id=-1) and the root becomes clean."""
    from sri2db_spark.functions.pipeline import compact_batch_output

    out = tmp_path / "flat_only"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).coalesce(2).write.mode("overwrite").parquet(str(out))
    assert any(n.endswith(".parquet") for n in os.listdir(out))
    before, after = compact_batch_output(spark, str(out))
    assert before >= 2 and after >= 1
    assert not any(n.endswith(".parquet") for n in os.listdir(out))
    assert os.path.isdir(out / "batch_id=-1")
    got = sorted(r.doc_id for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 2]
