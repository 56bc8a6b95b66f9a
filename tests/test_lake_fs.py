"""The lake's driver-side filesystem routing (round 7).

Every LakeTable driver-side touch — partition listing, layout discovery,
compaction's file probing, backend-layout guards, Spark path
qualification — goes through ``committer.fs``. This suite runs the full
read/replace/snapshot/compact lifecycle parametrized over LocalFS,
ObjectStoreFS (no rename primitive), and the fsspec adapter bound to the
S3-shaped conditional-PUT fake — the same discipline
``test_committer.py::test_manifest_invariants_under_random_op_sequences``
applies to the commit protocol itself, extended to the whole lake. Also
covers the table-level pin manifest (a training cut as ONE object) and
the legacy partition-encoding fence.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.sinks.committer import ManifestCommitter
from sri2db_spark.sinks.fs import LocalFS, ObjectStoreFS, S3FsspecFS
from sri2db_spark.sinks.lake import (
    LakeTable,
    migrate_legacy_partition_dirs,
)

from .fake_fsspec import FakeFsspecFileSystem

BASEURL = "https://fake.api"
SCHEMA = (
    "href string, key string, modified timestamp, "
    "jsondata string, resourcetype string"
)


def _make_fs(kind: str):
    return {
        "local": LocalFS,
        "objectstore": ObjectStoreFS,
        "s3fsspec": lambda: S3FsspecFS(FakeFsspecFileSystem()),
    }[kind]()


def _rows(spark, path, tag, n):
    return spark.createDataFrame(
        [(f"{path}/{i}", str(i), None, tag, "T") for i in range(n)], SCHEMA
    )


@pytest.mark.parametrize("fs_kind", ["local", "objectstore", "s3fsspec"])
def test_lake_lifecycle_on_every_fs(spark, tmp_path, fs_kind):
    """replace → read/read_partition → pin/time-travel → CAS compaction →
    pin_table/read_table_snapshot → discover, entirely through one fs
    binding. ObjectStoreFS proves no rename is needed anywhere in the
    path; the fsspec run proves the adapter surface suffices (including
    put_if via the store's conditional PUT)."""
    fs = _make_fs(fs_kind)
    table = LakeTable(
        spark,
        str(tmp_path / "t"),
        LAYOUT_LARGE,
        committer=ManifestCommitter(fs=fs),
    )
    # two endpoint partitions
    assert table.replace_partition(_rows(spark, "/a", "e1", 3), BASEURL, "/a") == 3
    assert table.replace_partition(_rows(spark, "/b", "e1", 2), BASEURL, "/b") == 2
    assert table.count() == 5
    assert table.read_partition(BASEURL, "/a").count() == 3
    # partition values decode through the fs-routed listing
    assert {
        (b, p) for b, p, _ in table._list_partitions()
    } == {(BASEURL, "/a"), (BASEURL, "/b")}

    # pin + time travel
    snap = table.pin_partition(BASEURL, "/a", "run1")
    table.replace_partition(_rows(spark, "/a", "e2", 4), BASEURL, "/a")
    assert table.read_partition(BASEURL, "/a").count() == 4
    old = table.read_partition_snapshot(BASEURL, "/a", snap)
    assert old.count() == 3
    assert {r["jsondata"] for r in old.collect()} == {"e1"}

    # compaction: fs-routed listing + size probing + CAS commit
    before, after = table.compact_partition(BASEURL, "/a")
    assert before >= 1 and after >= 1
    assert table.read_partition(BASEURL, "/a").count() == 4

    # whole-table cut through the table-level manifest
    pinned = table.pin_table("cut")
    assert set(pinned) == {(BASEURL, "/a"), (BASEURL, "/b")}
    table.replace_partition(_rows(spark, "/a", "e3", 6), BASEURL, "/a")
    table.replace_partition(_rows(spark, "/c", "e3", 7), BASEURL, "/c")
    cut = table.read_table_snapshot("cut")
    assert cut.count() == 6  # 4 + 2, no /c
    assert {r["jsondata"] for r in cut.collect()} == {"e2", "e1"}
    table.unpin_table("cut")
    with pytest.raises(FileNotFoundError):
        table.read_table_snapshot("cut")

    # discovery probes leaves through the same fs
    got = LakeTable.discover(
        spark, str(tmp_path / "t"), committer=ManifestCommitter(fs=fs)
    )
    assert got.layout.has_baseurl and got.layout.has_path
    assert got.read_partition(BASEURL, "/b").count() == 2


def test_table_pin_is_one_object_and_conflicts_loudly(spark, tmp_path):
    table = LakeTable(
        spark,
        str(tmp_path / "t"),
        LAYOUT_LARGE,
        committer=ManifestCommitter(),
    )
    table.replace_partition(_rows(spark, "/a", "e1", 2), BASEURL, "/a")
    table.pin_table("cut")
    manifest = table._table_pin_path("cut")
    assert os.path.isfile(manifest)
    entries = json.loads(open(manifest).read())["partitions"]
    assert len(entries) == 1 and entries[0]["version"].startswith("v_")
    with pytest.raises(FileExistsError, match="already exists"):
        table.pin_table("cut")
    table.unpin_table("cut")
    assert not os.path.exists(manifest)


def test_table_pin_cut_is_self_consistent_under_concurrent_sync(
    spark, tmp_path, monkeypatch
):
    """A sync replacing a partition BETWEEN pin_table's capture and its
    manifest publication does not tear the cut: the manifest names the
    captured (pre-sync) versions and the snapshot reads them back."""
    table = LakeTable(
        spark,
        str(tmp_path / "t"),
        LAYOUT_LARGE,
        committer=ManifestCommitter(),
    )
    table.replace_partition(_rows(spark, "/a", "old", 3), BASEURL, "/a")
    table.replace_partition(_rows(spark, "/b", "old", 2), BASEURL, "/b")

    orig_pin_if = ManifestCommitter.pin_if
    fired = [False]

    def pin_if_with_interloping_sync(self, dst_dir, name, version, expected):
        out = orig_pin_if(self, dst_dir, name, version, expected)
        if not fired[0]:
            fired[0] = True
            # a full sync lands on BOTH partitions right after the first
            # partition's version was captured and pinned
            table.replace_partition(_rows(spark, "/a", "new", 9), BASEURL, "/a")
            table.replace_partition(_rows(spark, "/b", "new", 9), BASEURL, "/b")
        return out

    monkeypatch.setattr(ManifestCommitter, "pin_if", pin_if_with_interloping_sync)
    pinned = table.pin_table("cut")
    monkeypatch.setattr(ManifestCommitter, "pin_if", orig_pin_if)
    assert set(pinned) == {(BASEURL, "/a"), (BASEURL, "/b")}
    snap = table.read_table_snapshot("cut")
    rows = snap.collect()
    # the cut is the capture-time table: per-partition versions as
    # captured, never a mix of one partition pre-sync and a torn manifest
    by_path = {}
    for r in rows:
        by_path.setdefault(r["path"], set()).add(r["jsondata"])
    assert by_path["/a"] == {"old"} and len([r for r in rows if r["path"] == "/a"]) == 3
    # /b advanced BEFORE its capture (the interloper ran during /a's pin),
    # so the cut legitimately holds /b's post-sync version — but never a
    # half-written mix within one partition
    assert by_path["/b"] in ({"old"}, {"new"})
    live = table.read()
    assert live.count() == 18  # 9 + 9 current


def test_legacy_utf8_escaped_partition_fails_loudly_and_migrates(
    spark, tmp_path
):
    """ADVICE r6: a store written by the pre-r6 encoder (UTF-8 BYTE
    escaping — é → %C3%A9) must not silently decode to mojibake and fork
    the partition; reads raise with the migration path, and the one-time
    migration renames to the current per-character encoding."""
    table = LakeTable(
        spark,
        str(tmp_path / "t"),
        LAYOUT_LARGE,
        committer=ManifestCommitter(),
    )
    table.replace_partition(_rows(spark, "/café", "e1", 2), BASEURL, "/café")
    # rewrite the path segment the way the legacy encoder would have
    base = str(tmp_path / "t") + "/baseurl=" + "https%3A%2F%2Ffake.api"
    [pdir] = [n for n in os.listdir(base) if n.startswith("path=")]
    legacy = "path=%2Fcaf%C3%A9"  # UTF-8 bytes of /café, %XX-escaped
    os.rename(os.path.join(base, pdir), os.path.join(base, legacy))
    with pytest.raises(ValueError, match="legacy UTF-8"):
        table.read().count()
    renamed = migrate_legacy_partition_dirs(str(tmp_path / "t"))
    assert len(renamed) == 1
    assert table.read_partition(BASEURL, "/café").count() == 2
    assert {
        p for _b, p, _l in table._list_partitions()
    } == {"/café"}


def test_migration_refuses_forked_partition(tmp_path):
    root = tmp_path / "t"
    os.makedirs(root / "path=%2Fcaf%C3%A9")  # legacy
    os.makedirs(root / "path=%2Fcafé")  # current encoding, same value
    with pytest.raises(FileExistsError, match="forked"):
        migrate_legacy_partition_dirs(str(root))


def test_compact_batch_output_on_object_store_fs(spark, tmp_path):
    """Output maintenance runs against a rename-free fs binding: listing,
    fold, and source deletion all go through the interface."""
    from sri2db_spark.functions.pipeline import compact_batch_output

    out = str(tmp_path / "out")
    for b in range(4):
        spark.range(5).selectExpr("id", "id * 2 as v").write.mode(
            "overwrite"
        ).parquet(f"{out}/batch_id={b}")
    fs = ObjectStoreFS()
    before, after = compact_batch_output(spark, out, fs=fs)
    assert before >= 4 and after < before
    df = spark.read.parquet(out)
    assert df.count() == 20
    # replay-protected newest batch stays untouched; folded base is negative
    names = set(os.listdir(out))
    assert "batch_id=3" in names
    assert any(n.startswith("batch_id=-") for n in names)


def test_concurrent_pin_table_loser_cannot_overwrite_winner_pins(
    spark, tmp_path
):
    """Two pin_table runs with the same name conflict at the CLAIM step —
    before the loser has written a single per-partition pin. Previously
    the loser overwrote the winner's ``_PIN.<name>`` files (a plain put)
    before failing at the manifest, stripping the winner's versions of
    GC protection."""
    table = LakeTable(
        spark,
        str(tmp_path / "t"),
        LAYOUT_LARGE,
        committer=ManifestCommitter(),
    )
    table.replace_partition(_rows(spark, "/a", "w", 3), BASEURL, "/a")
    winner = table.pin_table("cut")
    part = table._partition_dir(BASEURL, "/a")
    pin_before = table.committer.pins(part)["cut"]
    with pytest.raises(FileExistsError, match="already exists"):
        table.pin_table("cut")
    # loser touched NOTHING: the winner's pin still names its version
    assert table.committer.pins(part)["cut"] == pin_before
    assert winner[(BASEURL, "/a")] == pin_before


def test_failed_pin_table_cleans_up_and_reads_never_see_partial_cut(
    spark, tmp_path, monkeypatch
):
    """pin_table failing mid-loop removes the pins it created and its
    pending manifest; a kill-9-style crash (pins + pending manifest left
    on disk) makes read_table_snapshot fail LOUDLY instead of silently
    returning the pinned subset as a complete cut, and unpin_table
    recovers."""
    table = LakeTable(
        spark,
        str(tmp_path / "t"),
        LAYOUT_LARGE,
        committer=ManifestCommitter(),
    )
    table.replace_partition(_rows(spark, "/a", "x", 2), BASEURL, "/a")
    table.replace_partition(_rows(spark, "/b", "x", 2), BASEURL, "/b")

    orig_pin_if = ManifestCommitter.pin_if
    calls = [0]

    def explode_on_second(self, dst_dir, name, version, expected):
        calls[0] += 1
        if calls[0] == 2:
            raise OSError("injected: fs died mid-pin")
        return orig_pin_if(self, dst_dir, name, version, expected)

    monkeypatch.setattr(ManifestCommitter, "pin_if", explode_on_second)
    with pytest.raises(OSError, match="injected"):
        table.pin_table("cut")
    monkeypatch.setattr(ManifestCommitter, "pin_if", orig_pin_if)
    # non-crash failure: everything cleaned up, name reusable
    assert not os.path.exists(table._table_pin_path("cut"))
    for p in ("/a", "/b"):
        assert "cut" not in table.committer.pins(
            table._partition_dir(BASEURL, p)
        )

    # kill-9 simulation: pin one partition + pending manifest, no finalize
    part_a = table._partition_dir(BASEURL, "/a")
    table.committer.pin(part_a, "crashed")
    table._fs.put(
        table._table_pin_path("crashed"), json.dumps({"state": "pending"})
    )
    with pytest.raises(RuntimeError, match="incomplete"):
        table.read_table_snapshot("crashed")
    table.unpin_table("crashed")
    assert not os.path.exists(table._table_pin_path("crashed"))
    pinned = table.pin_table("crashed")  # name reusable after cleanup
    assert set(pinned) == {(BASEURL, "/a"), (BASEURL, "/b")}


def test_pin_table_survives_gc_collecting_a_captured_version(
    spark, tmp_path, monkeypatch
):
    """The verify pass (step 3) catches a version deleted AFTER the
    per-partition pin-and-check passed — the delayed-rmtree window of a
    GC whose pins() read preceded the pin — and re-pins the partition
    against the new current version instead of publishing a cut that
    names a collected version."""
    table = LakeTable(
        spark,
        str(tmp_path / "t"),
        LAYOUT_LARGE,
        committer=ManifestCommitter(),
    )
    table.replace_partition(_rows(spark, "/a", "old", 3), BASEURL, "/a")
    part = table._partition_dir(BASEURL, "/a")
    v_old = table.committer.current_version(part)

    fired = [False]
    orig_resolve = ManifestCommitter.resolve

    def resolve_then_gc_nukes_v_old(self, dst_dir, version=None):
        out = orig_resolve(self, dst_dir, version)
        if not fired[0] and version == v_old and out is not None:
            fired[0] = True
            # per-partition check passes on v_old... then the racing GC's
            # delayed rmtree lands: a sync supersedes v_old and collects it
            table.replace_partition(
                _rows(spark, "/a", "new", 5), BASEURL, "/a"
            )
            self.fs.rmtree(os.path.join(dst_dir, v_old))
        return out

    monkeypatch.setattr(
        ManifestCommitter, "resolve", resolve_then_gc_nukes_v_old
    )
    pinned = table.pin_table("cut")
    monkeypatch.setattr(ManifestCommitter, "resolve", orig_resolve)
    assert pinned[(BASEURL, "/a")] != v_old  # re-pinned, not torn
    snap = table.read_table_snapshot("cut")
    assert snap.count() == 5  # reads the re-captured version


def test_pin_table_conflicts_with_live_legacy_pin(spark, tmp_path):
    """A pre-existing live pin_partition under the same name is a
    conflict, not something pin_table silently overwrites."""
    table = LakeTable(
        spark,
        str(tmp_path / "t"),
        LAYOUT_LARGE,
        committer=ManifestCommitter(),
    )
    table.replace_partition(_rows(spark, "/a", "x", 2), BASEURL, "/a")
    table.pin_partition(BASEURL, "/a", "cut")
    with pytest.raises(FileExistsError, match="live pin"):
        table.pin_table("cut")
    # the claim was rolled back: the name is free again once unpinned
    table.unpin_partition(BASEURL, "/a", "cut")
    assert table.pin_table("cut")
