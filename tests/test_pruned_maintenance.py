"""O(touched-files) state maintenance: _CARRY + _PRUNE_STATS.

A retraction against a committer-managed curation store must not rewrite
the whole store — at 100 TB a right-to-be-forgotten deletion of 3
documents cannot cost a full-store rewrite. These tests pin the pruned
protocol: per-file ``[min, max]`` key stats are published atomically with
every maintenance commit (``_PRUNE_STATS``), a retraction rewrites only
the files whose range can hold an affected row and publishes the rest BY
REFERENCE (``_CARRY`` entries naming each file's original physical
location), GC protects every version directory a retained version's
carry list references (transitively), and every consumer of a base —
reads AND compaction folds — resolves carried files, failing loudly when
one is missing rather than silently dropping rows from the dedup
anti-join.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sri2db_spark.functions import pipeline as P
from sri2db_spark.functions.statestore import (
    CARRY_MARKER,
    PRUNE_STATS,
    read_store,
    write_store_batch,
)
from sri2db_spark.sinks.committer import ManifestCommitter
from sri2db_spark.sinks.fs import LocalFS, ObjectStoreFS, S3FsspecFS

from .fake_fsspec import FakeFsspecFileSystem

SCHEMA = "doc_id long, text string, lang string"


def _make_fs(kind: str):
    return {
        "local": LocalFS,
        "objectstore": ObjectStoreFS,
        "s3fsspec": lambda: S3FsspecFS(FakeFsspecFileSystem()),
    }[kind]()


def _docs(spark, n=40, parts=4):
    """n docs with unique texts, range-partitioned by id so the bootstrap
    corpus base lands as `parts` files with disjoint id ranges."""
    df = spark.createDataFrame(
        [(i, f"document number {i} with its own unique words {i}", "en")
         for i in range(n)],
        SCHEMA,
    )
    return df.repartitionByRange(parts, "doc_id")


def _base(mc, path):
    b = mc.resolve(path)
    assert b is not None
    return b


def _corpus_ids(spark, state, mc):
    return {
        r.id
        for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    }


@pytest.mark.parametrize("fs_kind", ["local", "objectstore", "s3fsspec"])
def test_retraction_rewrites_only_touched_files(spark, tmp_path, fs_kind):
    """The headline property: retracting one id from a multi-file store
    rewrites ONE file; every other file is carried by reference, its old
    stats entry intact, and the result is row-identical to a full
    rewrite."""
    fs = _make_fs(fs_kind)
    mc = ManifestCommitter(fs=fs)
    state = str(tmp_path / "st")
    P.init_curation_state(_docs(spark), state, committer=mc)

    corpus = f"{state}/corpus"
    base0 = _base(mc, corpus)
    files0 = fs.walk_files(base0)
    assert len(files0) == 4  # range-partitioned bootstrap
    assert fs.exists(os.path.join(base0, PRUNE_STATS))

    P.retract_from_state(spark, state, [5], committer=mc)

    base1 = _base(mc, corpus)
    assert base1 != base0
    own = fs.walk_files(base1)
    carry = [
        line
        for line in fs.read(os.path.join(base1, CARRY_MARKER)).splitlines()
        if line
    ]
    # disjoint ranges: exactly one file can hold id 5
    assert len(own) == 1
    assert len(carry) == 3
    # carry entries name ORIGINAL physical locations inside the old base
    assert all(e.startswith(os.path.basename(base0) + "/") for e in carry)
    # the old base directory survives GC — its files are live data
    assert fs.isdir(base0)
    # rows: identical to a full retraction
    assert _corpus_ids(spark, state, mc) == set(range(40)) - {5}
    assert {
        r.id
        for r in read_store(spark, f"{state}/sigs", committer=mc).collect()
    } == set(range(40)) - {5}
    # hash store: doc 5's unique text died with it
    hashes = {
        r.h
        for r in read_store(spark, f"{state}/hashes", committer=mc).collect()
    }
    assert len(hashes) == 39
    # the new base's stats cover rewritten AND carried files, so the next
    # retraction is pruned too
    import json

    stats = json.loads(fs.read(os.path.join(base1, PRUNE_STATS)))
    assert set(stats["files"]) >= set(carry)
    P.retract_from_state(spark, state, [25], committer=mc)
    base2 = _base(mc, corpus)
    carry2 = [
        line
        for line in fs.read(os.path.join(base2, CARRY_MARKER)).splitlines()
        if line
    ]
    # flattened chains: re-carried files still name their ORIGINAL homes
    # (v_base0/... and v_base1/...), never a chain through base1 only
    assert len(fs.walk_files(base2)) == 1
    assert len(carry2) == 3
    heads = {e.split("/", 1)[0] for e in carry2}
    assert os.path.basename(base0) in heads
    assert _corpus_ids(spark, state, mc) == set(range(40)) - {5, 25}


def test_gc_protects_carried_dirs_until_unreferenced(spark, tmp_path):
    """keep_versions=0 — the harshest GC. A carried version dir must
    survive every commit that still references it (directly or through a
    retained version's chain) and be collected by the first commit that
    does not (a compaction, which folds everything)."""
    mc = ManifestCommitter(keep_versions=0)
    fs = mc.fs
    state = str(tmp_path / "gc")
    P.init_curation_state(_docs(spark), state, committer=mc)
    corpus = f"{state}/corpus"
    base0 = _base(mc, corpus)

    P.retract_from_state(spark, state, [5], committer=mc)
    assert fs.isdir(base0)  # referenced by the new base's carry
    P.retract_from_state(spark, state, [35], committer=mc)
    assert fs.isdir(base0)  # still referenced (flattened entries)
    assert _corpus_ids(spark, state, mc) == set(range(40)) - {5, 35}

    # compaction folds carried files into a fresh full base (no _CARRY),
    # releasing the old dirs to GC at its own commit
    P.compact_curation_state(spark, state, committer=mc)
    basec = _base(mc, corpus)
    assert not fs.exists(os.path.join(basec, CARRY_MARKER))
    assert not fs.isdir(base0)  # unreferenced → collected
    assert _corpus_ids(spark, state, mc) == set(range(40)) - {5, 35}
    # compaction refreshed the stats (the compacted base coalesces to few
    # files, so the next retraction may legitimately touch all of them —
    # what matters is that stats exist and the result stays correct)
    assert fs.exists(os.path.join(basec, PRUNE_STATS))
    P.retract_from_state(spark, state, [7], committer=mc)
    assert _corpus_ids(spark, state, mc) == set(range(40)) - {5, 35, 7}


def test_missing_carried_file_fails_loudly(spark, tmp_path):
    """A carried file can never legitimately vanish (GC keeps referenced
    dirs); if it does, reads must raise — silently dropping those rows
    would let duplicates through the exact-dedup anti-join."""
    mc = ManifestCommitter()
    state = str(tmp_path / "corrupt")
    P.init_curation_state(_docs(spark), state, committer=mc)
    corpus = f"{state}/corpus"
    base0 = _base(mc, corpus)
    P.retract_from_state(spark, state, [5], committer=mc)
    mc.fs.rmtree(base0)  # simulated external corruption
    with pytest.raises(FileNotFoundError, match="carries"):
        read_store(spark, corpus, committer=mc)
    # compaction (which folds the base) must hit the same wall, not
    # silently publish a store missing the carried rows
    with pytest.raises(FileNotFoundError, match="carries"):
        P.compact_curation_state(spark, state, committer=mc)


def test_shared_hash_survives_until_last_reference(spark, tmp_path):
    """Pruned hash maintenance: a content hash shared by two docs
    survives retracting one of them — with NO hash-store commit at all —
    and dies with the second."""
    mc = ManifestCommitter()
    state = str(tmp_path / "shared")
    docs = spark.createDataFrame(
        [(1, "same text twice", "en"), (2, "same text twice", "en"),
         (3, "a different text", "en")],
        SCHEMA,
    )
    P.init_curation_state(docs, state, committer=mc)
    hpath = f"{state}/hashes"
    v0 = mc.current_version(hpath)
    assert read_store(spark, hpath, committer=mc).count() == 2

    P.retract_from_state(spark, state, [1], committer=mc)
    # doc 2 still produces the hash: store untouched, not even a commit
    assert mc.current_version(hpath) == v0
    assert read_store(spark, hpath, committer=mc).count() == 2

    P.retract_from_state(spark, state, [2], committer=mc)
    assert mc.current_version(hpath) != v0
    assert read_store(spark, hpath, committer=mc).count() == 1
    assert _corpus_ids(spark, state, mc) == {3}


def test_retracting_absent_ids_commits_nothing(spark, tmp_path):
    """Retracting ids no store holds is a complete no-op: every file's
    range misses them, so no store commits a new version (no version
    churn, no GC pressure) and the data is untouched."""
    mc = ManifestCommitter()
    state = str(tmp_path / "noop")
    P.init_curation_state(_docs(spark), state, committer=mc)
    before = {
        sub: mc.current_version(f"{state}/{sub}")
        for sub in ("hashes", "sigs", "corpus")
    }
    P.retract_from_state(spark, state, [10_000, 20_000], committer=mc)
    after = {
        sub: mc.current_version(f"{state}/{sub}")
        for sub in ("hashes", "sigs", "corpus")
    }
    assert after == before
    assert _corpus_ids(spark, state, mc) == set(range(40))


def test_compaction_folds_carried_and_appended_rows(spark, tmp_path):
    """Compaction over a carried base + live appends loses nothing: the
    fold reads base ∪ carried ∪ appends (minus the replay-protected
    batch, preserved as-is)."""
    mc = ManifestCommitter()
    state = str(tmp_path / "fold")
    P.init_curation_state(_docs(spark), state, committer=mc)
    P.retract_from_state(spark, state, [5], committer=mc)  # creates carry
    # two appends so compaction folds one and preserves the newest
    for token, i in ((0, 100), (1, 101)):
        write_store_batch(
            spark.createDataFrame(
                [(i, f"appended doc {i}")], "id long, text string"
            ),
            f"{state}/corpus",
            token=token,
            fs=mc.fs,
        )
    P.compact_curation_state(spark, state, committer=mc)
    assert _corpus_ids(spark, state, mc) == (
        set(range(40)) - {5}
    ) | {100, 101}


def test_crash_between_hash_and_corpus_commit_rerun_converges(
    spark, tmp_path, monkeypatch
):
    """Hash-first ordering exists for crash recovery: the hash drop-set
    needs the retracted TEXT, which only the pre-rewrite corpus holds.
    Crash after the hash commit but before the corpus commit, re-run,
    and every store converges — the hash does not get double-dropped or
    resurrected."""
    mc = ManifestCommitter()
    state = str(tmp_path / "crash")
    P.init_curation_state(_docs(spark, n=12, parts=2), state, committer=mc)

    real_commit = mc.commit

    def boom(tmp_dir, dst_dir, expected_basis=None, **kw):
        if dst_dir.endswith("/corpus"):
            raise OSError("simulated crash before the corpus commit")
        return real_commit(tmp_dir, dst_dir, expected_basis=expected_basis)

    monkeypatch.setattr(mc, "commit", boom)
    with pytest.raises(OSError):
        P.retract_from_state(spark, state, [3], committer=mc)
    monkeypatch.undo()

    # hash already dropped; corpus/sigs still hold doc 3
    assert read_store(spark, f"{state}/hashes", committer=mc).count() == 11
    assert 3 in _corpus_ids(spark, state, mc)

    P.retract_from_state(spark, state, [3], committer=mc)
    assert _corpus_ids(spark, state, mc) == set(range(12)) - {3}
    assert {
        r.id
        for r in read_store(spark, f"{state}/sigs", committer=mc).collect()
    } == set(range(12)) - {3}
    assert read_store(spark, f"{state}/hashes", committer=mc).count() == 11


def test_incremental_compaction_carries_base_and_folds_appends(spark, tmp_path):
    """Scheduled-compaction shape: folding the appends must not rewrite
    the base — the new version's own files hold only the appended rows,
    the whole base rides along as _CARRY, stats stay complete, and a
    cross-duplicate (an append row already in the base, the replayed-
    after-fold case) enters exactly once."""
    mc = ManifestCommitter()
    fs = mc.fs
    state = str(tmp_path / "inc")
    P.init_curation_state(_docs(spark), state, committer=mc)
    corpus = f"{state}/corpus"
    base0 = _base(mc, corpus)
    n_base0 = len(fs.walk_files(base0))

    # three appends: two foldable + the replay-protected newest; one row
    # (id 3) duplicates a base row and must not re-enter
    for token, rows in (
        (0, [(100, "appended doc one hundred")]),
        (1, [(101, "appended doc one oh one"),
             (3, "the quick brown fox number 3 jumps over the lazy dog "
                 "while the rain in spain falls mainly on plain 3")]),
        (2, [(102, "appended doc one oh two")]),
    ):
        write_store_batch(
            spark.createDataFrame(rows, "id long, text string"),
            corpus,
            token=token,
            fs=fs,
        )
    # make the duplicate REAL: id 3's text must equal the bootstrap text
    dup_text = [
        r.text
        for r in read_store(spark, corpus, committer=mc).collect()
        if r.id == 3
    ]
    assert len(dup_text) == 2  # base row + append row, pre-compaction

    rep = P.compact_curation_state(spark, state, committer=mc, incremental=True)
    assert "corpus" in rep
    base1 = _base(mc, corpus)
    # base untouched: old dir intact, new version carries ALL its files
    assert fs.isdir(base0)
    carry = [
        line
        for line in fs.read(os.path.join(base1, CARRY_MARKER)).splitlines()
        if line
    ]
    assert len(carry) == n_base0
    # own files hold only the folded appends (tiny), not the base
    assert len(fs.walk_files(base1)) < n_base0
    # rows: everything exactly once (the id-3 cross-dup did not re-enter)
    rows = read_store(spark, corpus, committer=mc).collect()
    got = sorted(r.id for r in rows)
    assert got == sorted(set(range(40)) | {100, 101, 102})
    # stats stayed complete → a retraction right after is still pruned
    import json

    stats = json.loads(fs.read(os.path.join(base1, PRUNE_STATS)))
    assert set(stats["files"]) >= set(carry)
    P.retract_from_state(spark, state, [101], committer=mc)
    assert _corpus_ids(spark, state, mc) == set(range(40)) | {100, 102}

    # a second incremental pass with nothing to fold commits nothing
    v = mc.current_version(corpus)
    rep2 = P.compact_curation_state(
        spark, state, committer=mc, incremental=True
    )
    assert "corpus" not in rep2
    assert mc.current_version(corpus) == v


def test_nothing_to_fold_rerun_still_sweeps_crashed_cleanup(
    spark, tmp_path, monkeypatch
):
    """An incremental compaction that commits and then crashes during its
    cleanup leaves fenced stale dirs; re-running with nothing new to fold
    must still remove them (re-run-converges contract), not skip out on
    the empty fold set."""
    mc = ManifestCommitter()
    fs = mc.fs
    state = str(tmp_path / "sweep")
    P.init_curation_state(_docs(spark, n=10, parts=1), state, committer=mc)
    corpus = f"{state}/corpus"
    import time

    for token, i in ((0, 50), (1, 51)):
        write_store_batch(
            spark.createDataFrame(
                [(i, f"appended doc {i}")], "id long, text string"
            ),
            corpus,
            token=token,
            fs=fs,
        )
        os.utime(f"{corpus}/batch_id={token}", (time.time() - 100 + token,) * 2)

    real_rmtree = fs.rmtree

    def boom(p):
        if "/corpus/" in p and "batch_id=" in p:
            raise OSError("simulated crash during cleanup")
        return real_rmtree(p)

    monkeypatch.setattr(fs, "rmtree", boom)
    with pytest.raises(OSError):
        P.compact_curation_state(spark, state, committer=mc, incremental=True)
    monkeypatch.undo()
    assert os.path.isdir(f"{corpus}/batch_id=0")  # fenced garbage on disk
    v = mc.current_version(corpus)
    # re-run: nothing new to fold, but the garbage must go — and no
    # version churn happens for it
    P.compact_curation_state(spark, state, committer=mc, incremental=True)
    assert not os.path.isdir(f"{corpus}/batch_id=0")
    assert os.path.isdir(f"{corpus}/batch_id=1")  # replay-protected: kept
    assert mc.current_version(corpus) == v
    ids = {r.id for r in read_store(spark, corpus, committer=mc).collect()}
    # folded batch (50) in the base, preserved replay batch (51) still live
    assert ids == set(range(10)) | {50, 51}


def test_incremental_output_compaction_leaves_prior_bases(spark, tmp_path):
    """Minor compaction of a batch-id-addressed OUTPUT dir: positive
    tokens fold into the next negative token, prior compacted bases are
    NOT rewritten, and with keys a cross-base duplicate (replayed batch
    whose rows already reached a base) enters exactly once."""
    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, "id long, text string")  # noqa: E731

    # prior compacted base (as a full fold would have left it)
    mk([(1, "one"), (2, "two")]).write.parquet(f"{out}/batch_id=-1")
    # three stream batches; batch 5 duplicates id 2 from the base
    mk([(3, "three")]).write.parquet(f"{out}/batch_id=4")
    mk([(4, "four"), (2, "two")]).write.parquet(f"{out}/batch_id=5")
    mk([(5, "five")]).write.parquet(f"{out}/batch_id=6")  # replay-protected
    import time

    now = time.time()
    for i, n in enumerate(("batch_id=-1", "batch_id=4", "batch_id=5", "batch_id=6")):
        os.utime(f"{out}/{n}", (now + i, now + i))

    base_files_before = sorted(
        os.listdir(f"{out}/batch_id=-1")
    )
    before, after = P.compact_batch_output(
        spark, out, keys=["id"], incremental=True
    )
    assert after < before
    # the prior base is byte-untouched and batches 4/5 folded into -2
    assert sorted(os.listdir(f"{out}/batch_id=-1")) == base_files_before
    assert os.path.isdir(f"{out}/batch_id=-2")
    assert not os.path.isdir(f"{out}/batch_id=4")
    assert not os.path.isdir(f"{out}/batch_id=5")
    assert os.path.isdir(f"{out}/batch_id=6")  # replay-protected
    rows = spark.read.parquet(out).collect()
    assert sorted(r.id for r in rows) == [1, 2, 3, 4, 5]  # id 2 once

    # a later FULL fold re-coalesces the accumulated bases
    P.compact_batch_output(spark, out, keys=["id"])
    assert not os.path.isdir(f"{out}/batch_id=-1")
    rows = spark.read.parquet(out).collect()
    assert sorted(r.id for r in rows) == [1, 2, 3, 4, 5]


def test_incremental_compaction_requires_versioned_committer(spark, tmp_path):
    with pytest.raises(ValueError, match="incremental"):
        P.compact_curation_state(
            spark, str(tmp_path / "x"), incremental=True
        )


def test_prune_plan_properties(tmp_path):
    """Property test of the pure planning core (no Spark): for ANY stats
    layout and retraction set, (a) soundness — a carried file's range
    misses every retracted value, so no affected row can ride along;
    (b) completeness — rewrite ∪ carry covers exactly the input files;
    (c) stats completeness — every carried file keeps a stats entry;
    (d) appends/flats and stats-less files are always rewritten."""
    import os as _os

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sri2db_spark.functions.pipeline import _prune_plan
    from sri2db_spark.sinks.fs import LocalFS

    fs = LocalFS()
    store = str(tmp_path / "store")
    base = _os.path.join(store, "v_base")
    _os.makedirs(base, exist_ok=True)

    rng = st.tuples(
        st.integers(-50, 50), st.integers(-50, 50)
    ).map(lambda t: [min(t), max(t)])

    @settings(max_examples=200, deadline=None)
    @given(
        file_ranges=st.lists(rng, min_size=0, max_size=12),
        missing_stats=st.sets(st.integers(0, 11)),
        n_appends=st.integers(0, 3),
        values=st.lists(st.integers(-60, 60), min_size=1, max_size=8),
    )
    def run(file_ranges, missing_stats, n_appends, values):
        import json as _json

        names = [f"v_base/f{i}.parquet" for i in range(len(file_ranges))]
        stats = {
            "key": "id",
            "files": {
                n: r
                for i, (n, r) in enumerate(zip(names, file_ranges))
                if i not in missing_stats
            },
        }
        fs.put(_os.path.join(base, "_PRUNE_STATS"), _json.dumps(stats))
        files = [_os.path.join(store, n) for n in names] + [
            _os.path.join(store, f"batch_id={i}/p{i}.parquet")
            for i in range(n_appends)
        ]
        plan = _prune_plan(fs, store, base, files, values)
        assert plan is not None
        rewrite, carry, cstats = plan
        # completeness: a file is rewritten xor carried
        assert sorted(rewrite + [_os.path.join(store, c) for c in carry]) == sorted(files)
        # appends always rewritten
        for f in files:
            if "batch_id=" in f:
                assert f in rewrite
        vset = set(values)
        for c in carry:
            # stats completeness
            assert c in cstats and cstats[c] == stats["files"][c]
            lo, hi = stats["files"][c]
            # soundness: the carried range misses every retracted value
            assert not any(lo <= v <= hi for v in vset)
        # stats-less base files always rewritten
        for i in missing_stats:
            if i < len(names):
                assert _os.path.join(store, names[i]) in rewrite

    run()


def test_string_keys_prune_too(spark, tmp_path):
    """Stats and pruning work for string ids (the sri resource-key case),
    not just numeric ones — JSON round-trips both."""
    mc = ManifestCommitter()
    state = str(tmp_path / "strid")
    docs = spark.createDataFrame(
        [(f"/persons/{i:04d}", f"text body {i}", "en") for i in range(20)],
        "doc_id string, text string, lang string",
    ).repartitionByRange(3, "doc_id")
    P.init_curation_state(docs, state, committer=mc)
    P.retract_from_state(spark, state, ["/persons/0003"], committer=mc)
    base = _base(mc, f"{state}/corpus")
    assert mc.fs.exists(os.path.join(base, CARRY_MARKER))
    got = _corpus_ids(spark, state, mc)
    assert got == {f"/persons/{i:04d}" for i in range(20)} - {"/persons/0003"}


def test_gc_spared_pinned_victim_keeps_its_carry_chain(spark, tmp_path):
    """pin_table racing GC: a victim pinned between GC's first pins() read
    and its delete loop is spared by the re-read — and the version dirs its
    _CARRY references must be spared WITH it, or the freshly pinned
    snapshot resolves to a deleted base (corruption the re-read was added
    to prevent)."""
    from sri2db_spark.functions.statestore import resolve_carried

    mc = ManifestCommitter(keep_versions=0)
    fs = mc.fs
    state = str(tmp_path / "race")
    P.init_curation_state(_docs(spark), state, committer=mc)
    corpus = f"{state}/corpus"
    base0 = _base(mc, corpus)
    P.retract_from_state(spark, state, [5], committer=mc)
    base1 = _base(mc, corpus)  # carries files living in base0

    # inject the racing pin exactly between GC's carry-ref computation and
    # its delete loop: _carry_refs sits in that window
    orig = mc._carry_refs
    fired = []

    def racing(dst_dir, versions):
        res = orig(dst_dir, versions)
        if dst_dir.rstrip("/").endswith("corpus") and not fired:
            fired.append(True)
            fs.put(
                os.path.join(dst_dir, mc.PIN_PREFIX + "snap"),
                os.path.basename(base1),
            )
        return res

    mc._carry_refs = racing
    try:
        # full compaction publishes a carry-less base; with keep_versions=0
        # both base0 and base1 are victims of its GC
        P.compact_curation_state(spark, state, committer=mc)
    finally:
        del mc._carry_refs

    # the pinned victim survived — and so did the dir its carry references
    assert fs.isdir(base1)
    assert fs.isdir(base0)
    # the pinned snapshot still resolves end to end
    files = resolve_carried(fs, corpus, base1)
    assert files
    # and a later commit's GC keeps honoring the pinned chain
    P.retract_from_state(spark, state, [7], committer=mc)
    assert fs.isdir(base1) and fs.isdir(base0)
    assert resolve_carried(fs, corpus, base1)


def _census(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            s = os.stat(p)
            out[os.path.relpath(p, root)] = (s.st_mtime_ns, s.st_size)
    return out


def test_output_retraction_rewrites_only_touched_batches(spark, tmp_path):
    """retract_from_output (RTBF for the PUBLISHED corpus): victims
    disappear, survivors of touched dirs fold into a new negative-token
    base, and every untouched batch_id dir is byte-identical."""
    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    mk([(1, "one"), (2, "two")]).write.parquet(f"{out}/batch_id=0")
    mk([(3, "three"), (4, "four")]).write.parquet(f"{out}/batch_id=1")
    mk([(5, "five"), (6, "six")]).write.parquet(f"{out}/batch_id=2")
    before = _census(out)

    n = P.retract_from_output(spark, out, [3, 10**9])
    assert n == 1
    left = {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert left == {1, 2, 4, 5, 6}
    # batch 1 (victim's home) is gone; its survivor rides in batch_id=-1;
    # batches 0 and 2 are byte-identical
    assert not os.path.exists(f"{out}/batch_id=1")
    assert os.path.isdir(f"{out}/batch_id=-1")
    after = _census(out)
    for rel, sig in before.items():
        top = rel.split(os.sep)[0]
        if top in ("batch_id=0", "batch_id=2"):
            assert after[rel] == sig, rel

    # no-op retraction: 0 removed; the only disk change allowed is the
    # sweep retiring the PRIOR fold's fully-swept marker+sentinel (so
    # later maintenance ticks stop re-probing its entry list) — data
    # files are untouched
    c2 = _census(out)
    assert P.retract_from_output(spark, out, [10**9]) == 0
    c3 = _census(out)
    retired = {
        rel
        for rel in set(c2) - set(c3)
        if rel.endswith((P.RETRACT_MARKER, P.RETRACT_COMMITTED))
    }
    assert set(c2) - set(c3) == retired
    assert {k: v for k, v in c3.items()} == {
        k: v for k, v in c2.items() if k not in retired
    }
    c2 = c3
    assert P.retract_from_output(spark, out, [10**9]) == 0
    assert _census(out) == c2  # second no-op: truly nothing

    # retracting every remaining row leaves a readable-but-empty layout
    assert P.retract_from_output(spark, out, [1, 2, 4, 5, 6]) == 5
    remaining = [
        d for d in os.listdir(out) if d.startswith("batch_id=")
    ]
    assert remaining == []


def test_output_retraction_handles_flats_and_string_ids(spark, tmp_path):
    """Legacy flat root files are probed and folded too; string id
    columns work (the sri resource-key case)."""
    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id string, text string")  # noqa: E731
    mk([("a", "1"), ("b", "2")]).write.parquet(f"{out}/batch_id=0")
    # a legacy flat file at the root
    flat_src = str(tmp_path / "flat")
    mk([("c", "3"), ("d", "4")]).write.parquet(flat_src)
    for f in os.listdir(flat_src):
        if f.endswith(".parquet"):
            os.rename(os.path.join(flat_src, f), os.path.join(out, f))

    n = P.retract_from_output(spark, out, ["c"], id_col="doc_id")
    assert n == 1
    dirs = sorted(d for d in os.listdir(out) if d.startswith("batch_id="))
    assert dirs == ["batch_id=-1", "batch_id=0"]
    left = {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert left == {"a", "b", "d"}
    # no flats remain at the root
    assert not [f for f in os.listdir(out) if f.endswith(".parquet")]


def test_output_retraction_rerun_after_crash_leaves_no_duplicates(spark, tmp_path):
    """The crash contract, executed at both windows of the two-phase fold:
    (a) die between the committed survivors base and the source removal —
    the re-run's sweep finishes the removal (survivors exactly once);
    (b) die mid-write (marker without _SUCCESS) — the sweep discards the
    partial base and the retraction redoes cleanly."""
    from sri2db_spark.sinks.fs import LocalFS

    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    mk([(1, "one"), (2, "two")]).write.parquet(f"{out}/batch_id=0")
    mk([(3, "three"), (4, "four")]).write.parquet(f"{out}/batch_id=1")

    # (a) crash before removal: run the real fold with removal disabled
    class _DiesBeforeRemoval(LocalFS):
        def rmtree(self, path):
            raise RuntimeError("crash injected before source removal")

    with pytest.raises(RuntimeError, match="crash injected"):
        P.retract_from_output(spark, out, [3], fs=_DiesBeforeRemoval())
    # victims still visible + transient survivor duplicate — the documented
    # in-between state
    assert os.path.exists(f"{out}/batch_id=1")
    assert os.path.exists(f"{out}/batch_id=-1/{P.RETRACT_MARKER}")
    assert os.path.exists(f"{out}/batch_id=-1/{P.RETRACT_COMMITTED}")
    # the protocol must not lean on Spark's _SUCCESS (deployments disable
    # it via marksuccessfuljobs=false): recovery is identical without it
    if os.path.exists(f"{out}/batch_id=-1/_SUCCESS"):
        os.remove(f"{out}/batch_id=-1/_SUCCESS")

    n = P.retract_from_output(spark, out, [3])  # re-run finishes
    rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert rows == [(1, "one"), (2, "two"), (4, "four")]  # no duplicate 4
    assert not os.path.exists(f"{out}/batch_id=1")

    # (b) crash mid-write: marker present, the fold's own commit sentinel
    # missing (the sentinel is fs.put by retract_from_output AFTER the
    # survivors' write — deliberately not Spark's disableable _SUCCESS)
    mk([(5, "five"), (6, "six")]).write.parquet(f"{out}/batch_id=2")
    partial = f"{out}/batch_id=-9"
    os.makedirs(partial)
    with open(f"{partial}/{P.RETRACT_MARKER}", "w") as f:
        f.write("batch_id=2/part-nonexistent.parquet")
    mk([(6, "six")]).coalesce(1).write.mode("append").parquet(partial)
    assert not os.path.exists(f"{partial}/{P.RETRACT_COMMITTED}")

    n = P.retract_from_output(spark, out, [5])
    assert n == 1
    assert not os.path.exists(partial)  # partial base discarded
    rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert rows == [(1, "one"), (2, "two"), (4, "four"), (6, "six")]


def test_output_retraction_preserves_legitimate_duplicate_ids(spark, tmp_path):
    """Recovery is identity-free: an output that legitimately holds the
    same id in several places (compact_batch_output with keys=None folds
    verbatim; replays) must keep EVERY copy of a non-victim row — the old
    id-based idempotence anti-join silently dropped a touched-dir survivor
    whose id also lived in a retained negative base."""
    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    # a prior compaction base (no marker) holding id 4...
    mk([(4, "four@base"), (7, "seven")]).write.parquet(f"{out}/batch_id=-1")
    # ...and a live batch holding a victim plus ANOTHER copy of id 4
    mk([(3, "three"), (4, "four@batch")]).write.parquet(f"{out}/batch_id=1")

    n = P.retract_from_output(spark, out, [3])
    assert n == 1
    rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        (4, "four@base"),
        (4, "four@batch"),  # the duplicate the anti-join used to eat
        (7, "seven"),
    ]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    layout=st.lists(
        st.lists(st.integers(0, 59), min_size=1, max_size=6, unique=True),
        min_size=1,
        max_size=5,
    ),
    retract=st.sets(st.integers(0, 70), max_size=8),
)
def test_output_retraction_matches_model(spark, tmp_path, layout, retract):
    """Model-based: for ANY batch layout (ids may repeat across dirs —
    replays) and ANY retraction set, the readable output afterwards is
    exactly {all ids} − {retracted}, each surviving id present at least
    once and duplicate-free iff it was duplicate-free before or its dirs
    were folded."""
    import shutil as _sh
    import uuid

    out = str(tmp_path / f"m{uuid.uuid4().hex[:8]}")
    all_ids: list[int] = []
    for b, ids in enumerate(layout):
        spark.createDataFrame(
            [(i, f"t{i}") for i in ids], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{out}/batch_id={b}")
        all_ids += ids
    n = P.retract_from_output(spark, out, sorted(retract))
    expected_victims = sum(1 for i in all_ids if i in retract)
    assert n == expected_victims
    dirs = [d for d in os.listdir(out) if d.startswith("batch_id=")]
    if not dirs:
        assert set(all_ids) <= retract
    else:
        got = [r.doc_id for r in spark.read.parquet(out).collect()]
        assert set(got) == set(all_ids) - retract
        # survivors never multiply: per-id count is bounded by its
        # original multiplicity
        from collections import Counter

        before_c, after_c = Counter(all_ids), Counter(got)
        for i, c in after_c.items():
            assert c <= before_c[i], (i, c, before_c[i])
    _sh.rmtree(out, ignore_errors=True)


def test_compaction_never_resurrects_retracted_victims(spark, tmp_path):
    """compact_batch_output must sweep interrupted retraction folds before
    planning: a committed retraction whose source removal was interrupted
    still has victim rows in the old sources, and folding those together
    with the survivors' base would bring the retracted documents BACK into
    the published output — a permanent RTBF violation."""
    from sri2db_spark.sinks.fs import LocalFS

    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    mk([(1, "one"), (2, "two")]).write.parquet(f"{out}/batch_id=0")
    mk([(3, "victim"), (4, "four")]).write.parquet(f"{out}/batch_id=1")

    # retraction of id 3 commits its fold but dies before source removal
    class _DiesBeforeRemoval(LocalFS):
        def rmtree(self, path):
            raise RuntimeError("crash injected before source removal")

    with pytest.raises(RuntimeError, match="crash injected"):
        P.retract_from_output(spark, out, [3], fs=_DiesBeforeRemoval())
    assert os.path.exists(f"{out}/batch_id=1")  # victim still on disk

    # compaction (keys=None — verbatim fold) must NOT fold the stale
    # sources back in
    P.compact_batch_output(spark, out)
    rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert rows == [(1, "one"), (2, "two"), (4, "four")]  # 3 never returns

    # mid-write partial base (marker without the commit sentinel): from
    # the compaction path this is indistinguishable from a retraction
    # CURRENTLY mid-fold, so compaction must neither fold its fragment
    # rows in nor delete it — it is EXCLUDED and left for the next
    # retraction run (which may safely discard a true corpse)
    mk([(5, "five"), (6, "six")]).write.parquet(f"{out}/batch_id=7")
    partial = f"{out}/batch_id=-9"
    os.makedirs(partial)
    with open(f"{partial}/{P.RETRACT_MARKER}", "w") as f:
        f.write("batch_id=7/part-nonexistent.parquet")
    mk([(6, "six")]).coalesce(1).write.mode("append").parquet(partial)

    P.compact_batch_output(spark, out)
    assert os.path.isdir(partial)  # excluded, not destroyed (live-fold safe)
    folded = sorted(
        d for d in os.listdir(out) if d.startswith("batch_id=")
    )
    assert partial.rsplit("/", 1)[-1] in folded
    # the next retraction run discards the corpse; no duplicate 6 remains
    P.retract_from_output(spark, out, [10**9])
    assert not os.path.exists(partial)
    rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        (1, "one"), (2, "two"), (4, "four"), (5, "five"), (6, "six")
    ]
