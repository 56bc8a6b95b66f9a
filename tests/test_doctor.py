"""Read-only doctor checks (functions/doctor.py + the doctor CLI): a
healthy structure reports healthy, every seeded corruption is named, and
the CLI exit code distinguishes the two (0 vs 4)."""

from __future__ import annotations

import os
import shutil

import pytest

from sri2db_spark import cli
from sri2db_spark.functions import doctor as D
from sri2db_spark.functions import pipeline as P
from sri2db_spark.sinks.committer import ManifestCommitter


def _docs(spark, n=30):
    return spark.createDataFrame(
        [(i, f"unique document text number {i}", "en") for i in range(n)],
        "doc_id long, text string, lang string",
    ).repartitionByRange(3, "doc_id")


def test_healthy_state_and_cli_exit_codes(spark, tmp_path, capsys):
    mc = ManifestCommitter()
    state = str(tmp_path / "state")
    P.init_curation_state(_docs(spark), state, committer=mc)
    P.retract_from_state(spark, state, [5], committer=mc)

    rep = D.check_curation_state(state, committer=mc)
    assert rep["healthy"], rep["issues"]
    stores = rep["info"]["stores"]
    assert set(stores) == {"hashes", "sigs", "corpus"}
    # the retraction carried files: doctor sees and validates them
    assert stores["corpus"]["info"]["carried_files"] > 0
    assert "_PRUNE_STATS" in stores["corpus"]["info"]

    assert cli.main(["doctor", "--state", state]) == 0
    out = capsys.readouterr().out
    assert '"healthy": true' in out

    # corruption: remove the carried base out from under the store
    corpus = f"{state}/corpus"
    current = mc.resolve(corpus)
    carried = mc._carry_refs(corpus, [os.path.basename(current)])  # noqa: SLF001
    assert carried
    shutil.rmtree(os.path.join(corpus, sorted(carried)[0]))
    rep2 = D.check_curation_state(state, committer=mc)
    assert not rep2["healthy"]
    assert any("carried" in i for i in rep2["issues"])
    assert cli.main(["doctor", "--state", state]) == 4


def test_doctor_versioned_store_reports_orphans_and_stats(spark, tmp_path):
    """Crashed-stage leftovers are reclaimable INFO, not issues; a stats
    file that misses a committed file IS an issue."""
    import json

    from sri2db_spark.functions.statestore import PRUNE_STATS

    mc = ManifestCommitter()
    state = str(tmp_path / "state")
    P.init_curation_state(_docs(spark), state, committer=mc)
    corpus = f"{state}/corpus"

    # a crashed stage: version dir without a commit marker
    os.makedirs(mc.stage(corpus), exist_ok=True)
    rep = D.check_versioned_store(corpus, committer=mc)
    assert rep["healthy"], rep["issues"]
    assert rep["info"].get("reclaimable_stage_dirs")

    # stats coverage gaps are efficiency INFO (the prune planner treats
    # stats-less files conservatively), but a stats entry naming a file
    # that is NOT committed is an issue — reads planned from it would fail
    current = mc.resolve(corpus)
    sp = os.path.join(current, PRUNE_STATS)
    meta = json.loads(mc.fs.read(sp))
    victim = sorted(meta["files"])[0]
    del meta["files"][victim]
    meta["files"]["part-never-written.parquet"] = meta["files"][
        sorted(meta["files"])[0]
    ]
    mc.fs.put(sp, json.dumps(meta))
    rep2 = D.check_versioned_store(corpus, committer=mc)
    assert rep2["info"][PRUNE_STATS]["uncovered_files"] >= 1
    assert not rep2["healthy"]
    assert any("not committed" in i for i in rep2["issues"])


def test_doctor_lake_flags_legacy_segments(spark, tmp_path):
    from sri2db_spark.model.schema import LAYOUT_LARGE
    from sri2db_spark.sinks.lake import LakeTable

    mc = ManifestCommitter()
    loc = str(tmp_path / "lake")
    table = LakeTable(spark, loc, LAYOUT_LARGE, committer=mc)
    df = spark.createDataFrame(
        [("/a/1", "1", None, "{}", "_A", "/a", "https://x")],
        "href string, key string, modified timestamp, jsondata string, "
        "resourcetype string, path string, baseurl string",
    )
    table.replace_partition(df, "https://x", "/a")
    rep = D.check_lake(loc, committer=mc)
    assert rep["healthy"], rep["issues"]
    assert rep["info"]["partitions"] == 1

    # a pre-r6 UTF-8-byte-escaped partition name
    os.makedirs(os.path.join(loc, "baseurl=%C3%A9legacy"))
    rep2 = D.check_lake(loc, committer=mc)
    assert not rep2["healthy"]
    assert any("legacy" in i for i in rep2["issues"])
    assert cli.main(["doctor", "--lake", loc]) == 4


def test_doctor_output_dir(spark, tmp_path, capsys):
    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    mk([(1, "a")]).write.parquet(f"{out}/batch_id=0")
    mk([(2, "b")]).write.parquet(f"{out}/batch_id=-1")
    rep = D.check_batch_output(out)
    assert rep["healthy"]
    assert rep["info"] == {"live_batches": 1, "compacted_bases": 1, "legacy_flats": 0}
    assert cli.main(["doctor", "--output", out]) == 0
    capsys.readouterr()

    os.makedirs(f"{out}/not_a_batch")
    rep2 = D.check_batch_output(out)
    assert not rep2["healthy"]
    assert any("unexpected subdirectory" in i for i in rep2["issues"])


def test_doctor_reports_retraction_recovery_states(spark, tmp_path):
    """The two crash windows of retract_from_output's two-phase fold are
    benign-but-visible states (victims/duplicates transiently readable);
    the doctor must surface both as info + a re-run hint, never as
    corruption."""
    from sri2db_spark.functions import pipeline as P

    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    mk([(1, "a"), (2, "b")]).write.parquet(f"{out}/batch_id=0")

    # committed fold whose source removal was interrupted: marker +
    # sentinel present, a listed source file still on disk
    committed = f"{out}/batch_id=-1"
    src_file = next(
        f for f in os.listdir(f"{out}/batch_id=0") if f.endswith(".parquet")
    )
    mk([(2, "b")]).coalesce(1).write.parquet(committed)
    with open(f"{committed}/{P.RETRACT_MARKER}", "w") as f:
        f.write(f"batch_id=0/{src_file}")
    open(f"{committed}/{P.RETRACT_COMMITTED}", "w").close()

    # mid-write partial: marker without sentinel
    crashed = f"{out}/batch_id=-2"
    os.makedirs(crashed)
    with open(f"{crashed}/{P.RETRACT_MARKER}", "w") as f:
        f.write("batch_id=0/part-nonexistent.parquet")

    rep = D.check_batch_output(out)
    assert rep["healthy"], rep["issues"]  # recoverable, not corruption
    assert rep["info"]["pending_retraction_sweeps"] == 1
    assert rep["info"]["crashed_retraction_folds"] == 1
    assert "output-retract" in rep["info"]["hint"]

    # the next retraction run actually clears both states
    P.retract_from_output(spark, out, [10**9])
    rep2 = D.check_batch_output(out)
    assert "pending_retraction_sweeps" not in rep2["info"]
    assert "crashed_retraction_folds" not in rep2["info"]


def test_doctor_zordered_store_with_appends(spark, tmp_path):
    """The zordered flavor (bare-basename stats + carried generations)
    checks healthy after an append and flags a removed generation."""
    from pyspark.sql import functions as F

    from sri2db_spark.functions.layout import append_zordered, write_zordered

    mc = ManifestCommitter()
    path = str(tmp_path / "zt")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 5).cast("bigint").alias("v"),
    )
    write_zordered(mk(0, 100), path, ["id", "v"], n_files=3, committer=mc)
    append_zordered(mk(100, 150), path, ["id", "v"], n_files=1, committer=mc)

    rep = D.check_versioned_store(path, committer=mc)
    assert rep["healthy"], rep["issues"]
    assert rep["info"]["carried_files"] == 3
    assert "_FILE_STATS.json" in rep["info"]
    assert cli.main(["doctor", "--store", path]) == 0

    # carry-chain observability: one prior generation carried; after a
    # second append, two; every full write_zordered drops back to zero
    stats_info = rep["info"]["_FILE_STATS.json"]
    assert stats_info["generations_carried"] == 1
    assert "files_per_point" in stats_info and "id" in stats_info["files_per_point"]
    # a second append whose ids OVERLAP the base range — the realistic
    # ingest shape whose cross-generation overlap decays skipping
    append_zordered(mk(0, 150), path, ["id", "v"], n_files=2, committer=mc)
    rep_b = D.check_versioned_store(path, committer=mc)
    assert rep_b["info"]["_FILE_STATS.json"]["generations_carried"] == 2
    fpp_before = rep_b["info"]["_FILE_STATS.json"]["files_per_point"]["id"]
    write_zordered(mk(0, 200), path, ["id", "v"], n_files=3, committer=mc)
    rep_c = D.check_versioned_store(path, committer=mc)
    ci = rep_c["info"]["_FILE_STATS.json"]
    assert ci["generations_carried"] == 0
    # re-clustering restores skipping selectivity: a point predicate now
    # scans fewer files than the 3-generation chain needed (z-order
    # interleaves both dims, so per-column overlap never reaches 1.0
    # exactly — the metric is for the TREND an operator watches)
    assert ci["files_per_point"]["id"] < fpp_before
    assert "hint" not in ci

    # the re-cluster hint appears once enough generations accumulate
    import sri2db_spark.functions.doctor as DD

    orig = DD.RECLUSTER_GENERATIONS
    DD.RECLUSTER_GENERATIONS = 1
    try:
        append_zordered(mk(200, 210), path, ["id", "v"], n_files=1, committer=mc)
        rep_d = D.check_versioned_store(path, committer=mc)
        hint = rep_d["info"]["_FILE_STATS.json"]["hint"]
        # the cheap O(overlap) path leads; the full rewrite is the fallback
        assert "zorder-compact" in hint and "write_zordered" in hint
    finally:
        DD.RECLUSTER_GENERATIONS = orig

    # a removed carried generation must flag (fresh table, fresh chain)
    path2 = str(tmp_path / "zt_broken")
    write_zordered(mk(0, 100), path2, ["id", "v"], n_files=3, committer=mc)
    base0 = mc.resolve(path2)
    append_zordered(mk(100, 150), path2, ["id", "v"], n_files=1, committer=mc)
    shutil.rmtree(base0)
    rep2 = D.check_versioned_store(path2, committer=mc)
    assert not rep2["healthy"]
    assert any("carried" in i for i in rep2["issues"])


def test_empty_id_lists_are_noops(spark, tmp_path):
    """Retracting/deleting an EMPTY id list must return 0, not crash on
    schema inference from an empty dataset."""
    from pyspark.sql import functions as F

    import sri2db_spark.functions.similarity as S
    from sri2db_spark.functions.layout import write_zordered

    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "a")], "doc_id long, text string"
    ).write.parquet(f"{out}/batch_id=0")
    assert P.retract_from_output(spark, out, []) == 0

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "idx")
    S.build_ivf_index(emb, idx, nlist=8)
    assert S.ann_index_delete(spark, idx, []) == 0


def test_append_zordered_rejects_statsless_base(spark, tmp_path):
    from pyspark.sql import functions as F

    from sri2db_spark.functions.layout import FILE_STATS, append_zordered, write_zordered

    mc = ManifestCommitter()
    path = str(tmp_path / "zs")
    df = spark.range(0, 20).select(
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 3).cast("bigint").alias("v"),
    )
    write_zordered(df, path, ["id", "v"], n_files=2, committer=mc)
    mc.fs.remove(os.path.join(mc.resolve(path), FILE_STATS))
    with pytest.raises(ValueError, match="not a .*write_zordered"):
        append_zordered(df, path, ["id", "v"], 1, committer=mc)


def test_doctor_with_rename_committer_reports_flat_layout(spark, tmp_path):
    """--committer rename must report, not crash: flat stores have no
    versions/pins/carries to validate."""
    from sri2db_spark.sinks.committer import RenameCommitter

    rc = RenameCommitter()
    state = str(tmp_path / "flat")
    P.init_curation_state(_docs(spark), state, committer=rc)
    rep = D.check_curation_state(state, committer=rc)
    assert rep["healthy"], rep["issues"]
    assert all(
        s["kind"] == "flat_store" for s in rep["info"]["stores"].values()
    )
    assert (
        cli.main(["doctor", "--state", state, "--committer", "rename"]) == 0
    )


def test_doctor_flags_malformed_stats_shape(spark, tmp_path):
    from sri2db_spark.functions.statestore import PRUNE_STATS

    mc = ManifestCommitter()
    state = str(tmp_path / "ms")
    P.init_curation_state(_docs(spark), state, committer=mc)
    corpus = f"{state}/corpus"
    mc.fs.put(os.path.join(mc.resolve(corpus), PRUNE_STATS), "[]")
    rep = D.check_versioned_store(corpus, committer=mc)
    assert not rep["healthy"]
    assert any("malformed" in i for i in rep["issues"])


def test_doctor_ann_index(spark, tmp_path, capsys):
    """Index layout checks: healthy IVF and IVF-PQ, stray files, and the
    mixed cid=/cell= corruption saved_index_kind routing prevents."""
    from pyspark.sql import functions as F

    import sri2db_spark.functions.similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx, nlist=8)
    rep = D.check_ann_index(idx)
    assert rep["healthy"], rep["issues"]
    assert rep["info"]["index_kind"] == "ivf" and rep["info"]["cells"] > 0
    assert cli.main(["doctor", "--index", idx]) == 0
    capsys.readouterr()

    idx2 = str(tmp_path / "ivfpq")
    S.build_ivfpq_index(emb, idx2, nlist=4, m=4, ksub=16)
    rep2 = D.check_ann_index(idx2)
    assert rep2["healthy"], rep2["issues"]
    assert rep2["info"]["index_kind"] == "ivfpq"

    # corruption: an IVF-style cid= dir appended into the IVF-PQ index
    os.makedirs(os.path.join(idx2, "cells", "cid=0", "batch_id=-1"))
    rep3 = D.check_ann_index(idx2)
    assert not rep3["healthy"]
    assert any("mixed" in i for i in rep3["issues"])
    assert cli.main(["doctor", "--index", idx2]) == 4


def test_doctor_ann_index_orphans_empties_and_meta_drift(spark, tmp_path, capsys):
    """r8 verdict item 7: doctor --index flags hand-corrupted upsert/delete
    residue — an orphan cell no probe can reach, empty partitions left by
    a crashed delete, and meta/kind drift."""
    import shutil

    import sri2db_spark.functions.similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx, nlist=8)
    assert D.check_ann_index(idx)["healthy"]

    # ORPHAN cell: a cid with no trained centroid (unreachable vectors)
    some_cell = next(
        n for n in sorted(os.listdir(os.path.join(idx, "cells")))
        if n.startswith("cid=")
    )
    src_part = next(
        os.path.join(r, f)
        for r, _, fs_ in os.walk(os.path.join(idx, "cells", some_cell))
        for f in fs_ if f.endswith(".parquet")
    )
    os.makedirs(os.path.join(idx, "cells", "cid=99"))
    shutil.copy(src_part, os.path.join(idx, "cells", "cid=99", "part-0.parquet"))
    rep = D.check_ann_index(idx)
    assert not rep["healthy"]
    assert any("orphan cell 'cid=99'" in i for i in rep["issues"])
    assert rep["info"]["n_centroids"] == 8
    shutil.rmtree(os.path.join(idx, "cells", "cid=99"))

    # EMPTY partition: crashed-delete residue (delete removes emptied dirs)
    os.makedirs(os.path.join(idx, "cells", some_cell, "batch_id=5"))
    rep = D.check_ann_index(idx)
    assert not rep["healthy"]
    assert any("empty cell partition" in i for i in rep["issues"])
    assert cli.main(["doctor", "--index", idx]) == 4
    capsys.readouterr()
    os.rmdir(os.path.join(idx, "cells", some_cell, "batch_id=5"))

    # META/KIND drift: a meta sidecar on a codebook-less index
    os.makedirs(os.path.join(idx, "meta"))
    rep = D.check_ann_index(idx)
    assert not rep["healthy"]
    assert any("kind drift" in i for i in rep["issues"])
    assert any("meta directory holds no parquet data" in i for i in rep["issues"])
    shutil.rmtree(os.path.join(idx, "meta"))

    # empty codebooks dir flips the detected kind AND is flagged as dataless
    os.makedirs(os.path.join(idx, "codebooks"))
    rep = D.check_ann_index(idx)
    assert not rep["healthy"]
    assert rep["info"]["index_kind"] == "ivfpq"
    assert any("codebooks directory holds no parquet data" in i for i in rep["issues"])
    shutil.rmtree(os.path.join(idx, "codebooks"))

    assert D.check_ann_index(idx)["healthy"]  # all corruptions reverted


def test_doctor_ann_index_corrupt_centroids_is_an_issue_not_a_crash(
    spark, tmp_path
):
    """A truncated centroids parquet (crashed-write damage — the exact
    input doctor exists to diagnose) must become an issue entry, never an
    ArrowInvalid traceback (review r9)."""
    import sri2db_spark.functions.similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx, nlist=8)
    part = next(
        os.path.join(r, f)
        for r, _, fs_ in os.walk(os.path.join(idx, "centroids"))
        for f in fs_ if f.endswith(".parquet")
    )
    data = open(part, "rb").read()
    open(part, "wb").write(data[: len(data) // 2])  # truncate mid-file
    rep = D.check_ann_index(idx)
    assert not rep["healthy"]
    assert any("unreadable parquet" in i for i in rep["issues"])
    assert "n_centroids" not in rep["info"]  # check skipped, reported


def test_doctor_ann_index_empty_cell_with_foreign_subdir_is_layout_issue(
    spark, tmp_path
):
    """An empty cell whose only content is a non-batch subdirectory is a
    LAYOUT violation, not just delete residue — the empty-cell shortcut
    must not hide it (review r9)."""
    import sri2db_spark.functions.similarity as S

    import shutil

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx, nlist=8)
    # foreign subdir inside a POPULATED cell
    os.makedirs(os.path.join(idx, "cells", "cid=2", "tmp_staging"), exist_ok=True)
    # EMPTY the cid=5 cell (keep the dir) so its only content is the
    # foreign subdir — this is the branch that previously short-circuited
    # to "delete residue" and hid the layout violation
    cell5 = os.path.join(idx, "cells", "cid=5")
    for entry in os.listdir(cell5):
        p = os.path.join(cell5, entry)
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    os.makedirs(os.path.join(cell5, "tmp_staging2"), exist_ok=True)
    rep = D.check_ann_index(idx)
    assert not rep["healthy"]
    assert any("non-batch subdirectory 'tmp_staging'" in i for i in rep["issues"])
    assert any("non-batch subdirectory 'tmp_staging2'" in i for i in rep["issues"])
    # the emptied cell is ALSO reported as residue, not silently skipped
    assert any("cid=5" in i and "empty cell partition" in i for i in rep["issues"])
