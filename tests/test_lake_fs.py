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

    orig_pin = ManifestCommitter.pin
    fired = [False]

    def pin_with_interloping_sync(self, dst_dir, name, version=None):
        out = orig_pin(self, dst_dir, name, version)
        if not fired[0]:
            fired[0] = True
            # a full sync lands on BOTH partitions right after the first
            # partition's version was captured and pinned
            table.replace_partition(_rows(spark, "/a", "new", 9), BASEURL, "/a")
            table.replace_partition(_rows(spark, "/b", "new", 9), BASEURL, "/b")
        return out

    monkeypatch.setattr(ManifestCommitter, "pin", pin_with_interloping_sync)
    pinned = table.pin_table("cut")
    monkeypatch.setattr(ManifestCommitter, "pin", orig_pin)
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
