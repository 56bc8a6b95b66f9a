"""Committer-routed curation-state maintenance.

The curation state stores (hashes / sigs / corpus) were the last surface
swapped with the non-atomic two-rename protocol. These tests pin the
object-store-grade properties after routing them through the pluggable
committer: reads resolve the compacted base through the manifest pointer,
compaction/retraction publish with ONE atomic pointer write (a crashed
maintenance op leaves the old state fully live), replay protection
survives both compaction and a checkpoint reset, and backend flips fail
loudly in both directions.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sri2db_spark.functions import pipeline as P
from sri2db_spark.functions.statestore import read_store
from sri2db_spark.sinks.committer import MANIFEST, ManifestCommitter

NAT = (
    "the quick brown fox jumps over the lazy dog while the rain in "
    "spain falls mainly on the plain and the cat sat on the mat"
)
NAT2 = (
    "a completely different natural sentence about spark and the art "
    "of distributed systems where the shuffle is the enemy of the "
    "fast query"
)
NAT3 = (
    "yet another unrelated passage on benchmarking storage engines "
    "under concurrent readers and writers with snapshot isolation"
)
SCHEMA = "doc_id long, text string, lang string"


def _bench(spark):
    return spark.createDataFrame(
        [(999, "benchmark secret sauce phrase entirely unique here", "en")],
        SCHEMA,
    )


def test_curation_state_end_to_end_on_manifest_backend(spark, tmp_path):
    """init → incremental batches (with replay) → compaction → retraction,
    all committer-routed: no flat parquet ever sits at a store root, reads
    resolve through the manifest pointer, and every step keeps the same
    semantics as the rename-backend flow."""
    mc = ManifestCommitter()
    state = str(tmp_path / "vstate")
    seed = spark.createDataFrame([(1, NAT, "en")], SCHEMA)
    P.init_curation_state(seed, state, committer=mc)
    for sub in ("hashes", "sigs", "corpus"):
        entries = set(os.listdir(f"{state}/{sub}"))
        assert MANIFEST in entries
        assert not any(e.endswith(".parquet") for e in entries)
    b1 = spark.createDataFrame([(10, NAT, "en"), (11, NAT2, "en")], SCHEMA)
    out = {
        r.doc_id
        for r in P.curate_batch_incremental(
            spark, b1, state, _bench(spark), batch_token=0, committer=mc
        ).collect()
    }
    assert out == {11}  # 10 is an exact dup of the seeded doc 1
    # replay of the same token: same output, state rows exactly once
    replay = {
        r.doc_id
        for r in P.curate_batch_incremental(
            spark, b1, state, _bench(spark), batch_token=0, committer=mc
        ).collect()
    }
    assert replay == out
    ids = sorted(
        r.id for r in read_store(spark, f"{state}/sigs", committer=mc).collect()
    )
    assert ids == [1, 11]
    # compaction publishes through the pointer; the newest batch dir
    # survives as a batch dir (replay protection)
    rep = P.compact_curation_state(spark, state, committer=mc)
    assert set(rep) == {"hashes", "sigs", "corpus"}
    assert os.path.isdir(f"{state}/hashes/batch_id=0")
    ids_after = sorted(
        r.id for r in read_store(spark, f"{state}/sigs", committer=mc).collect()
    )
    assert ids_after == [1, 11]
    # a later batch still sees the compacted state: dup of doc 11 drops
    b2 = spark.createDataFrame([(20, NAT2, "en"), (21, NAT3, "en")], SCHEMA)
    out2 = {
        r.doc_id
        for r in P.curate_batch_incremental(
            spark, b2, state, _bench(spark), batch_token=1, committer=mc
        ).collect()
    }
    assert out2 == {21}
    # retraction: doc 11 disappears from every store; doc 1's hash stays
    P.retract_from_state(spark, state, [11], committer=mc)
    assert sorted(
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    ) == [1, 21]
    hashes = read_store(spark, f"{state}/hashes", committer=mc)
    assert hashes.count() == 2
    # the superseded appends were cleaned up post-commit
    assert not os.path.isdir(f"{state}/corpus/batch_id=0")


def test_state_compaction_crash_leaves_old_state_live(spark, tmp_path, monkeypatch):
    """The property the routing exists for: a compaction that CRASHES at
    its commit point leaves the store resolving to the complete OLD state
    — a reader mid-compaction sees old-or-new, never missing (the
    two-rename swap could leave the store briefly absent)."""
    mc = ManifestCommitter()
    state = str(tmp_path / "cstate")
    seed = spark.createDataFrame([(1, NAT, "en"), (2, NAT2, "en")], SCHEMA)
    P.init_curation_state(seed, state, committer=mc)
    b1 = spark.createDataFrame([(10, NAT3, "en")], SCHEMA)
    P.curate_batch_incremental(
        spark, b1, state, _bench(spark), batch_token=0, committer=mc
    ).collect()
    before = {
        r.id for r in read_store(spark, f"{state}/sigs", committer=mc).collect()
    }
    assert before == {1, 2, 10}

    real_replace = os.replace

    def boom(src, dst):
        if os.path.basename(dst) == MANIFEST:
            raise OSError("simulated crash at the commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError):
        P.compact_curation_state(spark, state, committer=mc)
    monkeypatch.undo()
    # every store still reads COMPLETE old state through its pointer
    for sub, n in (("hashes", 3), ("sigs", 3), ("corpus", 3)):
        assert read_store(spark, f"{state}/{sub}", committer=mc).count() == n
    # and a successful retry converges
    P.compact_curation_state(spark, state, committer=mc)
    after = {
        r.id for r in read_store(spark, f"{state}/sigs", committer=mc).collect()
    }
    assert after == before


def test_checkpoint_reset_keeps_live_batch_unfolded(spark, tmp_path):
    """ADVICE: if a stream checkpoint is reset (batch ids restart at 0)
    over a reused state dir, the LIVE replayable batch has the lowest
    token but the newest mtime. Compaction preserves the newest-mtime dir
    as well as the highest-token dir, so the replayable batch is never
    folded flat (which would defeat the replay's token exclusion)."""
    import time

    state = str(tmp_path / "rstate")
    store = f"{state}/hashes"
    now = time.time()
    for i, token in enumerate((5, 6, 0)):  # 0 written LAST = post-reset live
        spark.createDataFrame([(f"h{token}",)], "h string").write.mode(
            "overwrite"
        ).parquet(f"{store}/batch_id={token}")
        # pin mtimes to the write order even on coarse filesystems
        os.utime(f"{store}/batch_id={token}", (now + i, now + i))
    P.compact_curation_state(spark, state)
    assert os.path.isdir(f"{store}/batch_id=0")  # newest mtime: preserved
    assert os.path.isdir(f"{store}/batch_id=6")  # highest token: preserved
    assert not os.path.isdir(f"{store}/batch_id=5")  # history: folded
    # no rows were lost
    assert {r.h for r in read_store(spark, store).collect()} == {"h5", "h6", "h0"}


def test_versioned_committer_requires_batch_token(spark, tmp_path):
    mc = ManifestCommitter()
    state = str(tmp_path / "tstate")
    b = spark.createDataFrame([(1, NAT, "en")], SCHEMA)
    with pytest.raises(ValueError, match="batch_token"):
        P.curate_batch_incremental(
            spark, b, state, _bench(spark), committer=mc
        )


def test_state_backend_flip_fails_loudly(spark, tmp_path):
    """Both flip directions raise instead of silently reading an empty or
    duplicated store."""
    mc = ManifestCommitter()
    seed = spark.createDataFrame([(1, NAT, "en")], SCHEMA)
    # manifest store read without its committer
    vstate = str(tmp_path / "v")
    P.init_curation_state(seed, vstate, committer=mc)
    with pytest.raises(ValueError, match="manifest-committed"):
        read_store(spark, f"{vstate}/hashes")
    # flat store read through the manifest backend
    fstate = str(tmp_path / "f")
    P.init_curation_state(seed, fstate)
    with pytest.raises(ValueError, match="rename-backend layout"):
        read_store(spark, f"{fstate}/hashes", committer=mc)


def test_flat_store_migrates_via_committer_compaction(spark, tmp_path):
    """The documented migration path: compacting a legacy flat store WITH
    the versioned committer folds its files into the first committed
    version; subsequent committer reads and batches work unchanged."""
    mc = ManifestCommitter()
    state = str(tmp_path / "mig")
    seed = spark.createDataFrame([(1, NAT, "en"), (2, NAT2, "en")], SCHEMA)
    P.init_curation_state(seed, state)  # legacy flat layout
    P.compact_curation_state(spark, state, committer=mc)
    for sub in ("hashes", "sigs", "corpus"):
        entries = set(os.listdir(f"{state}/{sub}"))
        assert MANIFEST in entries
        assert not any(e.endswith(".parquet") for e in entries)
    ids = sorted(
        r.id for r in read_store(spark, f"{state}/sigs", committer=mc).collect()
    )
    assert ids == [1, 2]
    b = spark.createDataFrame([(10, NAT, "en"), (11, NAT3, "en")], SCHEMA)
    out = {
        r.doc_id
        for r in P.curate_batch_incremental(
            spark, b, state, _bench(spark), batch_token=0, committer=mc
        ).collect()
    }
    assert out == {11}  # exact dup vs migrated state still detected


def _state_with_crashed_retraction(spark, tmp_path, monkeypatch, name):
    """Build a committer-routed state holding docs {1, 2, 10}, then retract
    doc 10 with the post-commit append cleanup CRASHING — returns
    (state_dir, committer). Leaves corpus committed without doc 10 but with
    doc 10's stale batch_id=0 append still on disk (fenced by _FOLDED)."""
    mc = ManifestCommitter()
    state = str(tmp_path / name)
    seed = spark.createDataFrame([(1, NAT, "en"), (2, NAT2, "en")], SCHEMA)
    P.init_curation_state(seed, state, committer=mc)
    b1 = spark.createDataFrame([(10, NAT3, "en")], SCHEMA)
    P.curate_batch_incremental(
        spark, b1, state, _bench(spark), batch_token=0, committer=mc
    ).collect()
    # pin append mtimes well before the retraction's marker so the fence's
    # mtime guard is deterministic even on coarse-timestamp filesystems
    import time

    for sub in ("hashes", "sigs", "corpus"):
        d = f"{state}/{sub}/batch_id=0"
        if os.path.isdir(d):
            os.utime(d, (time.time() - 100, time.time() - 100))
    real_rmtree = mc.fs.rmtree

    def boom(path):
        # scoped to the corpus store: retraction rewrites hashes FIRST
        # (see retract_from_state), and this helper's scenario is "corpus
        # committed, its cleanup crashed"
        if "/corpus/" in path and "batch_id=" in path:
            raise OSError("simulated crash during post-commit cleanup")
        return real_rmtree(path)

    monkeypatch.setattr(mc.fs, "rmtree", boom)
    with pytest.raises(OSError):
        P.retract_from_state(spark, state, [10], committer=mc)
    monkeypatch.undo()
    return state, mc


def test_retraction_crash_before_cleanup_never_resurfaces_ids(
    spark, tmp_path, monkeypatch
):
    """The right-to-be-forgotten property under the worst crash: retraction
    commits the rewritten corpus, then dies before deleting the superseded
    appends. The stale append (which still physically holds doc 10's rows)
    is fenced by the new base's _FOLDED marker, so reads NEVER resurface
    the retracted id; a re-run completes the cleanup."""
    state, mc = _state_with_crashed_retraction(spark, tmp_path, monkeypatch, "ret")
    stale = f"{state}/corpus/batch_id=0"
    assert os.path.isdir(stale)  # the garbage is really still there...
    got = {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }
    assert got == {1, 2}  # ...but the retracted id does not resurface
    # re-run converges: garbage deleted, every store consistent
    P.retract_from_state(spark, state, [10], committer=mc)
    assert not os.path.isdir(stale)
    assert {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    } == {1, 2}
    assert {
        r.id for r in read_store(spark, f"{state}/sigs", committer=mc).collect()
    } == {1, 2}
    assert read_store(spark, f"{state}/hashes", committer=mc).count() == 2


def test_folded_fence_does_not_hide_fresh_reset_batch(
    spark, tmp_path, monkeypatch
):
    """A checkpoint reset may reuse a FENCED name (batch_id=0) for a live
    batch. The fence is mtime-guarded: a fresh dir newer than the marker
    stays visible even though its name is in the _FOLDED list."""
    import time

    from sri2db_spark.functions.statestore import write_store_batch

    state, mc = _state_with_crashed_retraction(spark, tmp_path, monkeypatch, "rst")
    fresh = spark.createDataFrame([(77, "brand new post-reset doc", "en")], SCHEMA)
    write_store_batch(
        fresh.select(F.col("doc_id").alias("id"), "text"),
        f"{state}/corpus",
        token=0,
    )
    now = time.time()
    os.utime(f"{state}/corpus/batch_id=0", (now + 100, now + 100))
    got = {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }
    assert got == {1, 2, 77}  # fresh rows visible, retracted id still gone


def test_compaction_deletes_fenced_garbage_without_remerging(
    spark, tmp_path, monkeypatch
):
    """Compaction after a crashed retraction must DELETE the fenced appends,
    not fold them back into the base (re-merging would resurface the
    retracted rows through maintenance itself)."""
    state, mc = _state_with_crashed_retraction(spark, tmp_path, monkeypatch, "cmp")
    P.compact_curation_state(spark, state, committer=mc)
    assert not os.path.isdir(f"{state}/corpus/batch_id=0")
    got = {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }
    assert got == {1, 2}


def test_compaction_fences_stale_flat_files_from_remigration(
    spark, tmp_path, monkeypatch
):
    """Root flat files a prior (crashed) rewrite already folded must be
    DELETED by the next compaction, never re-merged as if they were a
    legacy store awaiting migration — re-merging would resurface rows a
    retraction removed. Chain: migration compaction crashes before its
    flat cleanup, a retraction then removes doc 10 and ALSO crashes
    before cleanup; the stale flat files (which still hold doc 10's rows)
    must not leak the id back through the following compaction."""
    mc = ManifestCommitter()
    state = str(tmp_path / "ffence")
    seed = spark.createDataFrame(
        [(1, NAT, "en"), (2, NAT2, "en"), (10, NAT3, "en")], SCHEMA
    )
    P.init_curation_state(seed, state)  # legacy flat layout

    real_remove = mc.fs.remove

    def boom(path):
        if "/corpus/" in path and path.endswith(".parquet"):
            raise OSError("simulated crash during flat-file cleanup")
        return real_remove(path)

    monkeypatch.setattr(mc.fs, "remove", boom)
    with pytest.raises(OSError):
        P.compact_curation_state(spark, state, committer=mc)
    with pytest.raises(OSError):
        P.retract_from_state(spark, state, [10], committer=mc)
    monkeypatch.undo()

    flat_left = [
        n for n in os.listdir(f"{state}/corpus") if n.endswith(".parquet")
    ]
    assert flat_left  # the stale flat garbage (holding doc 10) is on disk
    # fence already protects reads...
    got = {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }
    assert got == {1, 2}
    # ...and compaction deletes the garbage instead of re-migrating it
    P.compact_curation_state(spark, state, committer=mc)
    assert not any(
        n.endswith(".parquet") for n in os.listdir(f"{state}/corpus")
    )
    got = {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }
    assert got == {1, 2}


def test_concurrent_maintenance_conflicts_instead_of_lost_update(
    spark, tmp_path, monkeypatch
):
    """Two read-modify-write maintenance ops racing the same store: the
    compaction captures its basis, then a retraction commits the corpus
    from under it. The compaction's commit must raise CommitConflict —
    NOT silently republish the pre-retraction rows (which would undo a
    right-to-be-forgotten deletion). A re-run compacts the new state."""
    from sri2db_spark.sinks.committer import CommitConflict

    mc = ManifestCommitter()
    state = str(tmp_path / "race")
    seed = spark.createDataFrame(
        [(1, NAT, "en"), (2, NAT2, "en"), (10, NAT3, "en")], SCHEMA
    )
    P.init_curation_state(seed, state, committer=mc)

    fired = [False]
    orig_stage = mc.stage

    def sneaky(dst):
        # between the compaction's basis capture and its commit, a
        # concurrent retraction rewrites the corpus
        if dst.endswith("/corpus") and not fired[0]:
            fired[0] = True
            P.retract_from_state(spark, state, [10], committer=ManifestCommitter())
        return orig_stage(dst)

    monkeypatch.setattr(mc, "stage", sneaky)
    with pytest.raises(CommitConflict):
        P.compact_curation_state(spark, state, committer=mc)
    monkeypatch.undo()

    # the retraction's result is preserved — the lost update did not happen
    got = {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }
    assert got == {1, 2}
    # re-run compacts the post-retraction state cleanly
    P.compact_curation_state(spark, state, committer=mc)
    got = {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }
    assert got == {1, 2}


def test_watermark_upsert_retries_past_concurrent_commit(spark, tmp_path):
    """The watermark-store upsert on the manifest backend is CAS-protected
    against writers in OTHER drivers (the in-process lock cannot see
    them): a conflicting commit between its read and its commit makes it
    re-read and re-apply instead of silently clobbering — and the
    concurrent writer's row survives."""
    from sri2db_spark.operators.watermark import WatermarkStore
    from sri2db_spark.sinks.committer import ManifestCommitter as MC

    loc = str(tmp_path / "synctimes")
    store_a = WatermarkStore(spark, loc, committer=MC())
    store_a.put("t", "http://a", "/r", "FULL", 1000, 2000)

    # simulate another driver committing between store_a's basis capture
    # and its commit: hook current_version to fire a competing upsert once
    mc = store_a.committer
    orig_cv = mc.current_version
    fired = [False]

    def hooked(dst):
        basis = orig_cv(dst)
        if not fired[0]:
            fired[0] = True
            other = WatermarkStore(spark, loc, committer=MC())
            # _put_locked directly: a writer in another DRIVER would not
            # share this process's location lock (calling put() here would
            # self-deadlock on it, which is exactly the point)
            other._put_locked("t", "http://b", "/r", "FULL", 5000, 6000)
        return basis

    mc.current_version = hooked
    store_a.put("t", "http://a", "/r", "FULL", 3000, 4000)  # retries inside
    mc.current_version = orig_cv

    assert store_a.get("t", "http://a", "/r", "FULL") == (3000, 4000)
    assert store_a.get("t", "http://b", "/r", "FULL") == (5000, 6000)


def test_fence_is_immune_to_mtime_granularity(spark, tmp_path, monkeypatch):
    """The coarse-timestamp hole: a checkpoint-reset batch recreates a
    FENCED name with an mtime equal to (or older than) the fence marker's
    — second-granularity object-store timestamps make this routine. The
    file-level fence must keep the fresh rows visible to reads AND fold
    (not delete) them through compaction: Spark part files are uuid-named,
    so exact-name exclusion needs no timestamp ordering at all."""
    import time

    from sri2db_spark.functions.statestore import write_store_batch

    state, mc = _state_with_crashed_retraction(spark, tmp_path, monkeypatch, "gran")
    marker_mtime = None
    base = mc.resolve(f"{state}/corpus")
    marker_mtime = os.path.getmtime(
        os.path.join(base, "_FOLDED")
    )
    fresh = spark.createDataFrame([(88, "post reset same second doc", "en")], SCHEMA)
    write_store_batch(
        fresh.select(F.col("doc_id").alias("id"), "text"),
        f"{state}/corpus",
        token=0,
    )
    # worst case: the fresh dir sorts AT/BELOW the marker's timestamp
    os.utime(f"{state}/corpus/batch_id=0", (marker_mtime - 5, marker_mtime - 5))
    got = {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }
    assert got == {1, 2, 88}  # fresh rows visible despite the older mtime
    P.compact_curation_state(spark, state, committer=mc)
    got = {
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }
    assert got == {1, 2, 88}  # folded into the base, never deleted
