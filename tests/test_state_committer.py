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
