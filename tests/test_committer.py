"""Commit protocols for the lake sink / watermark store.

The RenameCommitter is the local-filesystem default; the ManifestCommitter
is the object-store-safe protocol (versioned dirs + atomic pointer write).
The failure-injection tests pin the exact property that motivates it: with
non-atomic (or crashed-mid-way) directory renames, a manifest reader never
observes a missing or half-written destination.
"""

from __future__ import annotations

import json
import os

import pytest

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.operators.watermark import WatermarkStore
from sri2db_spark.sinks.committer import ManifestCommitter, RenameCommitter
from sri2db_spark.sinks.lake import LakeTable
from sri2db_spark.sources.sri_api import SriApiReader
from sri2db_spark.sync.engine import Sri2DbSync

from .fake_api import FakeSriApi

BASEURL = "https://fake.api"


def _write_dir(path, name_content: dict[str, str]) -> str:
    os.makedirs(path, exist_ok=True)
    for name, content in name_content.items():
        with open(os.path.join(path, name), "w") as f:
            f.write(content)
    return str(path)


def test_manifest_commit_resolve_roundtrip(tmp_path):
    c = ManifestCommitter()
    dst = str(tmp_path / "store")
    assert c.resolve(dst) is None  # nothing committed yet
    tmp1 = _write_dir(tmp_path / "t1", {"a.parquet": "one"})
    c.commit(tmp1, dst)
    phys1 = c.resolve(dst)
    assert phys1 is not None and open(os.path.join(phys1, "a.parquet")).read() == "one"
    tmp2 = _write_dir(tmp_path / "t2", {"a.parquet": "two"})
    c.commit(tmp2, dst)
    phys2 = c.resolve(dst)
    assert phys2 != phys1
    assert open(os.path.join(phys2, "a.parquet")).read() == "two"
    # superseded version retained for in-flight readers (keep_versions=1)
    assert os.path.isdir(phys1)
    tmp3 = _write_dir(tmp_path / "t3", {"a.parquet": "three"})
    c.commit(tmp3, dst)
    assert not os.path.isdir(phys1)  # gc'd once two commits superseded it


def test_manifest_crash_before_pointer_keeps_old_version_live(tmp_path, monkeypatch):
    """A crash after the data move but BEFORE the pointer write must leave
    the previous version resolvable — the commit point is the pointer."""
    c = ManifestCommitter()
    dst = str(tmp_path / "store")
    c.commit(_write_dir(tmp_path / "t1", {"a": "one"}), dst)
    phys1 = c.resolve(dst)

    real_replace = os.replace

    def boom(src, d):
        if os.path.basename(d) == "_MANIFEST":
            raise OSError("simulated crash at the commit point")
        return real_replace(src, d)

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError):
        c.commit(_write_dir(tmp_path / "t2", {"a": "two"}), dst)
    monkeypatch.undo()
    phys = c.resolve(dst)
    assert phys == phys1  # old version still live, reader unaffected
    assert open(os.path.join(phys, "a")).read() == "one"


def test_rename_crash_between_renames_loses_destination(tmp_path, monkeypatch):
    """The documented RenameCommitter gap: a crash between its two renames
    leaves the destination missing — exactly why object stores (where the
    'gap' is every commit) need the manifest protocol instead."""
    c = RenameCommitter()
    dst = str(tmp_path / "store")
    c.commit(_write_dir(tmp_path / "t1", {"a": "one"}), dst)

    real_rename = os.rename
    calls = {"n": 0}

    def crashy(src, d):
        calls["n"] += 1
        if calls["n"] == 2:  # after dst->old, before tmp->dst
            raise OSError("simulated crash between renames")
        return real_rename(src, d)

    monkeypatch.setattr(os, "rename", crashy)
    with pytest.raises(OSError):
        c.commit(_write_dir(tmp_path / "t2", {"a": "two"}), dst)
    monkeypatch.undo()
    assert c.resolve(dst) is None  # destination gone until repaired


def test_sync_end_to_end_on_manifest_backend(spark, tmp_path):
    """The reference-golden full sync, an update delta, and compaction all
    run unchanged on the manifest backend — and readers resolve through
    pointers at every step (no flat partition directory ever exists)."""
    api = FakeSriApi(n=10, page_size=3)
    table = LakeTable(
        spark, str(tmp_path / "table"), LAYOUT_LARGE,
        committer=ManifestCommitter(),
    )
    wm = WatermarkStore(
        spark, str(tmp_path / "synctimes"), committer=ManifestCommitter()
    )
    sync = Sri2DbSync(
        reader=SriApiReader(spark, BASEURL, fetch_json=api.fetch_json, limit=3),
        table=table,
        path=api.path,
        baseurl=BASEURL,
        layout=LAYOUT_LARGE,
        watermarks=wm,
    )
    res = sync.full_sync()
    assert res.resources_synced == 10 and res.rows_after == 10
    rows = {r["href"]: r for r in table.read().collect()}
    assert set(rows) == {f"/a/{i}" for i in range(1, 11)}
    assert json.loads(rows["/a/7"]["jsondata"])["name"] == "Name of resource /a"
    last, start = wm.get("resources", BASEURL, "/a", "FULL")
    assert last is not None and start is not None
    # partition dir holds only versions + manifest — no loose parquet
    part = table._partition_dir(BASEURL, "/a")
    entries = set(os.listdir(part))
    assert "_MANIFEST" in entries
    assert all(
        e in ("_MANIFEST", "_commits")
        or e.startswith(("v_", "_PIN."))
        # persistent dot-named pointer locks (see LocalFS._lock_pointer)
        or (e.startswith(".") and e.endswith(".cas_lock"))
        for e in entries
    )
    # delta: update one resource, sync, merged in place
    api.update(3, modified="2031-01-01T00:00:00Z")
    res2 = sync.delta_sync()
    assert res2.rows_after == 10
    updated = table.read_partition(BASEURL, "/a").filter("href = '/a/3'").first()
    assert updated["modified"].year == 2031
    # compaction works through resolve/commit
    before, after = table.compact_partition(BASEURL, "/a")
    assert before >= 1 and after >= 1
    assert table.count() == 10
    # watermark store is also pointer-resolved
    assert "_MANIFEST" in os.listdir(str(tmp_path / "synctimes"))


def test_backend_mismatch_raises_instead_of_empty_read(spark, tmp_path):
    """Flipping committer on an existing store must fail loudly: a
    manifest reader over flat rename-backend data would otherwise read the
    table as EMPTY and the next sync would publish only its delta."""
    schema = (
        "href string, key string, modified timestamp, "
        "jsondata string, resourcetype string"
    )
    rows = spark.createDataFrame([("/a/1", "1", None, "{}", "T")], schema)
    flat = LakeTable(spark, str(tmp_path / "t"), LAYOUT_LARGE)
    flat.replace_partition(rows, BASEURL, "/a")
    flipped = LakeTable(
        spark, str(tmp_path / "t"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    with pytest.raises(ValueError, match="rename-backend layout"):
        flipped.read().count()
    # and the reverse: manifest-committed dirs read by the rename backend
    mt = LakeTable(
        spark, str(tmp_path / "m"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    mt.replace_partition(rows, BASEURL, "/a")
    back = LakeTable(spark, str(tmp_path / "m"), LAYOUT_LARGE)
    with pytest.raises(ValueError, match="manifest-committed"):
        back.read().count()
    # watermark store: same guard
    from sri2db_spark.operators.watermark import WatermarkStore as WS

    ws = WS(spark, str(tmp_path / "wm"))
    ws.put("t", None, "/a", "FULL", 5, 6)
    with pytest.raises(ValueError, match="rename-backend layout"):
        WS(spark, str(tmp_path / "wm"), committer=ManifestCommitter()).get(
            "t", None, "/a", "FULL"
        )


def test_backend_mismatch_raises_on_writes_too(spark, tmp_path):
    """The layout guard must run on the WRITE path: a full sync writes via
    replace_partition without reading first, and a rename-committer commit
    over a manifest-versioned partition would rename the whole versioned
    tree (manifest, pins, history) aside and rmtree it — destroying every
    pinned snapshot GC promised to keep."""
    schema = (
        "href string, key string, modified timestamp, "
        "jsondata string, resourcetype string"
    )
    rows = spark.createDataFrame([("/a/1", "1", None, "{}", "T")], schema)
    mt = LakeTable(
        spark, str(tmp_path / "t"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    mt.replace_partition(rows, BASEURL, "/a")
    snap = mt.pin_partition(BASEURL, "/a", "keep-me")
    # misconfigured back to the rename backend: the write must fail loudly
    flipped = LakeTable(spark, str(tmp_path / "t"), LAYOUT_LARGE)
    with pytest.raises(ValueError, match="manifest-committed"):
        flipped.replace_partition(rows, BASEURL, "/a")
    with pytest.raises(ValueError, match="manifest-committed"):
        flipped.compact_partition(BASEURL, "/a")
    # the pinned snapshot is untouched by the failed writes
    assert mt.read_partition_snapshot(BASEURL, "/a", snap).count() == 1
    # and the reverse flip fails on writes over flat data as well
    flat = LakeTable(spark, str(tmp_path / "f"), LAYOUT_LARGE)
    flat.replace_partition(rows, BASEURL, "/a")
    as_manifest = LakeTable(
        spark, str(tmp_path / "f"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    with pytest.raises(ValueError, match="rename-backend layout"):
        as_manifest.replace_partition(rows, BASEURL, "/a")


def test_discover_skips_aborted_sibling_partition(spark, tmp_path):
    """discover() on the manifest backend must not give up because the
    FIRST hive sibling it walks into is an aborted/empty partition dir with
    no committed version — it probes leaves until one resolves."""
    schema = (
        "href string, key string, modified timestamp, "
        "jsondata string, resourcetype string"
    )
    rows = spark.createDataFrame([("/b/1", "1", None, "{}", "T")], schema)
    table = LakeTable(
        spark, str(tmp_path / "t"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    table.replace_partition(rows, BASEURL, "/b")
    # an aborted partition: staged version dir, no commit — and named so it
    # sorts FIRST in directory iteration order
    aborted = table._partition_dir(BASEURL, "/a")
    os.makedirs(os.path.join(aborted, "v_deadbeef"), exist_ok=True)
    got = LakeTable.discover(
        spark, str(tmp_path / "t"), committer=ManifestCommitter()
    )
    assert got.layout.has_baseurl and got.layout.has_path
    assert got.layout.has_resourcetype


@pytest.mark.parametrize("fs_cls", ["local", "objectstore", "fsspec"])
def test_manifest_invariants_under_random_op_sequences(tmp_path, fs_cls):
    """Property check: for ANY sequence of commit / crashed-commit / pin /
    unpin operations, (1) resolve() always returns a COMPLETE committed
    version (the content of some successful commit, never a partial or
    crashed one), (2) every pinned version stays readable, (3) history()
    lists only retained versions in ascending seq order.

    Parametrized over the filesystem layer: the same suite runs against
    ObjectStoreFS (no rename/move primitive at all) — the proof that the
    staged-in-place protocol needs nothing an object store lacks."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sri2db_spark.sinks.fs import FsspecFS, LocalFS, ObjectStoreFS

    from .fake_fsspec import FakeFsspecFileSystem

    make_fs = {
        "local": LocalFS,
        "objectstore": ObjectStoreFS,
        # the adapter over an fsspec-shaped backend whose writes are
        # PUT-on-close — the closest local model of a real s3fs binding
        "fsspec": lambda: FsspecFS(FakeFsspecFileSystem()),
    }[fs_cls]

    op = st.one_of(
        st.tuples(st.just("commit"), st.integers(0, 10**6)),
        st.tuples(st.just("crash_commit"), st.integers(0, 10**6)),
        st.tuples(st.just("pin"), st.sampled_from(["p1", "p2"])),
        st.tuples(st.just("unpin"), st.sampled_from(["p1", "p2"])),
    )

    @settings(max_examples=25, deadline=None)
    @given(ops=st.lists(op, min_size=1, max_size=12))
    def run(ops):
        import tempfile

        root = tempfile.mkdtemp(dir=tmp_path, prefix="prop_")
        c = ManifestCommitter(fs=make_fs())
        dst = os.path.join(root, "store")
        committed: list[str] = []  # payloads of successful commits, in order
        pins: dict[str, str] = {}  # name -> payload pinned
        n = 0
        real_replace = os.replace

        def _stage_payload(payload: str) -> str:
            # stage in place — the only write path valid on BOTH backends
            return _write_dir(c.stage(dst), {"a": payload})

        for kind, arg in ops:
            if kind == "commit":
                payload = f"payload-{arg}-{n}"
                c.commit(_stage_payload(payload), dst)
                committed.append(payload)
            elif kind == "crash_commit":
                payload = f"crashed-{arg}-{n}"

                def boom(src, d, _r=real_replace):
                    if os.path.basename(d) == "_MANIFEST":
                        raise OSError("crash at commit point")
                    return _r(src, d)

                staged = _stage_payload(payload)
                os.replace = boom
                try:
                    with pytest.raises(OSError):
                        c.commit(staged, dst)
                finally:
                    os.replace = real_replace
            elif kind == "pin" and committed:
                c.pin(dst, arg)
                pins[arg] = committed[-1]
            elif kind == "unpin":
                c.unpin(dst, arg)
                pins.pop(arg, None)
            n += 1
            # invariant 1: resolve is always a complete successful commit
            phys = c.resolve(dst)
            if committed:
                assert phys is not None
                assert open(os.path.join(phys, "a")).read() == committed[-1]
            else:
                assert phys is None
            # invariant 2: every live pin resolves to its pinned payload
            for name, payload in pins.items():
                v = c.pins(dst)[name]
                pphys = c.resolve(dst, version=v)
                assert pphys is not None
                assert open(os.path.join(pphys, "a")).read() == payload
            # invariant 3: history is ascending and only retained versions
            hist = c.history(dst)
            assert [s for s, _ in hist] == sorted(s for s, _ in hist)
            assert all(os.path.isdir(os.path.join(dst, v)) for _, v in hist)

    run()


def test_object_store_fs_stage_in_place_roundtrip(tmp_path):
    """The ObjectStoreFS contract end-to-end: staged-in-place commits, pin,
    GC and time travel all work with no rename primitive; a tmp dir staged
    OUTSIDE the destination is rejected (object stores cannot move)."""
    from sri2db_spark.sinks.fs import ObjectStoreFS

    c = ManifestCommitter(fs=ObjectStoreFS())
    dst = str(tmp_path / "store")
    for payload in ("one", "two", "three"):
        v = _write_dir(c.stage(dst), {"a.parquet": payload})
        c.commit(v, dst)
        if payload == "one":
            pinned = c.pin(dst, "run")
    phys = c.resolve(dst)
    assert open(os.path.join(phys, "a.parquet")).read() == "three"
    # the pinned first version survived two GC cycles and reads back
    old = c.resolve(dst, version=pinned)
    assert open(os.path.join(old, "a.parquet")).read() == "one"
    with pytest.raises(NotImplementedError, match="cannot rename"):
        c.commit(_write_dir(tmp_path / "elsewhere", {"a": "x"}), dst)


def test_fsspec_adapter_roundtrip_and_dir_mtime(tmp_path):
    """FsspecFS over an fsspec-shaped backend: staged-in-place commits,
    pin, GC, and time travel all work through fsspec's method surface,
    including getmtime on DIRECTORIES (no object-store analog — the
    adapter aggregates max(modified) over the keys below; the fake raises
    on modified(dir) exactly like s3fs, so GC aging covers that path)."""
    from sri2db_spark.sinks.fs import FsspecFS

    from .fake_fsspec import FakeFsspecFileSystem

    fs = FsspecFS(FakeFsspecFileSystem())
    c = ManifestCommitter(fs=fs)
    dst = str(tmp_path / "store")
    for payload in ("one", "two", "three", "four"):
        v = _write_dir(c.stage(dst), {"a.parquet": payload})
        c.commit(v, dst)  # each commit runs GC -> fs.getmtime(version dir)
        if payload == "one":
            pinned = c.pin(dst, "run")
    assert open(os.path.join(c.resolve(dst), "a.parquet")).read() == "four"
    assert (
        open(os.path.join(c.resolve(dst, version=pinned), "a.parquet")).read()
        == "one"
    )
    # directory mtime aggregates over contained keys; empty prefix is 0.0
    assert fs.getmtime(c.resolve(dst)) > 0.0
    assert fs.walk_files(dst) and all(
        f.endswith(".parquet") for f in fs.walk_files(dst)
    )


def test_staged_elsewhere_commit_survives_exdev(tmp_path, monkeypatch):
    """The legacy staged-elsewhere branch must commit across filesystem
    boundaries: os.rename raises EXDEV there, and the LocalFS move falls
    back to copy+delete (shutil.move) instead of failing."""
    import errno

    c = ManifestCommitter()
    dst = str(tmp_path / "store")
    real_rename = os.rename

    def exdev(src, d):
        raise OSError(errno.EXDEV, "Invalid cross-device link", src, d)

    monkeypatch.setattr(os, "rename", exdev)
    c.commit(_write_dir(tmp_path / "other_fs_tmp", {"a": "one"}), dst)
    monkeypatch.setattr(os, "rename", real_rename)
    assert open(os.path.join(c.resolve(dst), "a")).read() == "one"


def test_manifest_history_and_pinned_snapshot(tmp_path):
    """history() orders commits; a pin survives GC and resolves to the
    exact bytes committed; unpinning re-exposes it to GC."""
    c = ManifestCommitter()
    dst = str(tmp_path / "store")
    assert c.history(dst) == []
    c.commit(_write_dir(tmp_path / "t1", {"a": "one"}), dst)
    pinned = c.pin(dst, "train-2026-08")
    c.commit(_write_dir(tmp_path / "t2", {"a": "two"}), dst)
    c.commit(_write_dir(tmp_path / "t3", {"a": "three"}), dst)
    c.commit(_write_dir(tmp_path / "t4", {"a": "four"}), dst)
    hist = c.history(dst)
    assert [s for s, _ in hist] == sorted(s for s, _ in hist)
    versions = {v for _, v in hist}
    # v1 outlived two GC cycles because it is pinned; v2 was collected
    assert pinned in versions
    assert c.pins(dst) == {"train-2026-08": pinned}
    assert open(os.path.join(c.resolve(dst, version=pinned), "a")).read() == "one"
    assert open(os.path.join(c.resolve(dst), "a")).read() == "four"
    # unpin: the next commit's GC collects it (not eagerly)
    c.unpin(dst, "train-2026-08")
    assert c.resolve(dst, version=pinned) is not None
    c.commit(_write_dir(tmp_path / "t5", {"a": "five"}), dst)
    assert c.resolve(dst, version=pinned) is None
    # markers for collected versions are pruned (bounded metadata growth);
    # every retained version still has its marker and seq keeps ascending
    marks = dict(c._markers(dst))
    assert len(marks) <= 3  # current + keep_versions + the max-seq keeper
    hist = c.history(dst)
    assert all(os.path.isdir(os.path.join(dst, v)) for _, v in hist)
    c.commit(_write_dir(tmp_path / "t6", {"a": "six"}), dst)
    assert max(s for s, _ in c._markers(dst)) == 6


def test_lake_pin_and_time_travel(spark, tmp_path):
    """The training-run reproducibility hook: pin a partition snapshot,
    keep syncing over it, then time-travel back to byte-identical input."""
    table = LakeTable(
        spark, str(tmp_path / "t"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    schema = (
        "href string, key string, modified timestamp, "
        "jsondata string, resourcetype string"
    )

    def rows(tag, n):
        return spark.createDataFrame(
            [(f"/a/{i}", str(i), None, tag, "T") for i in range(n)], schema
        )

    table.replace_partition(rows("epoch1", 3), BASEURL, "/a")
    snap = table.pin_partition(BASEURL, "/a", "run42")
    for tag, n in (("epoch2", 4), ("epoch3", 5), ("epoch4", 6)):
        table.replace_partition(rows(tag, n), BASEURL, "/a")
    assert table.read_partition(BASEURL, "/a").count() == 6
    old = table.read_partition_snapshot(BASEURL, "/a", snap)
    assert old.count() == 3
    assert {r["jsondata"] for r in old.collect()} == {"epoch1"}
    # partition columns are re-attached on the snapshot read too
    assert {r["path"] for r in old.collect()} == {"/a"}
    assert [s for s, _ in table.partition_history(BASEURL, "/a")] == sorted(
        s for s, _ in table.partition_history(BASEURL, "/a")
    )
    table.unpin_partition(BASEURL, "/a", "run42")
    table.replace_partition(rows("epoch5", 7), BASEURL, "/a")
    with pytest.raises(FileNotFoundError):
        table.read_partition_snapshot(BASEURL, "/a", snap)
    # the rename backend keeps no history — explicit error, not silence
    flat = LakeTable(spark, str(tmp_path / "flat"), LAYOUT_LARGE)
    with pytest.raises(ValueError):
        flat.pin_partition(BASEURL, "/a", "nope")


def test_table_level_pin_and_snapshot(spark, tmp_path):
    """pin_table captures every partition's current version under one
    name; read_table_snapshot reassembles the pinned-time table even
    after every partition has advanced and new partitions appeared."""
    table = LakeTable(
        spark, str(tmp_path / "t"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    schema = (
        "href string, key string, modified timestamp, "
        "jsondata string, resourcetype string"
    )

    def rows(path, tag, n):
        return spark.createDataFrame(
            [(f"{path}/{i}", str(i), None, tag, "T") for i in range(n)], schema
        )

    table.replace_partition(rows("/a", "old", 3), BASEURL, "/a")
    table.replace_partition(rows("/b", "old", 2), BASEURL, "/b")
    pinned = table.pin_table("cut1")
    assert set(pinned) == {(BASEURL, "/a"), (BASEURL, "/b")}
    # every partition advances; a new partition appears after the pin
    table.replace_partition(rows("/a", "new", 5), BASEURL, "/a")
    table.replace_partition(rows("/b", "new", 6), BASEURL, "/b")
    table.replace_partition(rows("/c", "new", 7), BASEURL, "/c")
    assert table.count() == 18
    snap = table.read_table_snapshot("cut1")
    assert snap.count() == 5  # 3 + 2, no /c — the pinned-time table
    assert {r["jsondata"] for r in snap.collect()} == {"old"}
    table.unpin_table("cut1")
    # next commits GC the unpinned versions; the pin is then gone
    for _ in range(2):
        table.replace_partition(rows("/a", "newer", 1), BASEURL, "/a")
        table.replace_partition(rows("/b", "newer", 1), BASEURL, "/b")
    with pytest.raises(FileNotFoundError):
        table.read_table_snapshot("cut1").count()


def test_snapshot_read_folds_partition_literal_filter(spark, tmp_path):
    """A filter on the snapshot read's partition column must prune at plan
    time, not filter rows at runtime. The manifest read is ONE multi-path
    scan whose partition values come from the hive path segments, so the
    filter lands in the scan's PartitionFilters and the non-matching
    partition's files never enter the plan."""
    table = LakeTable(
        spark, str(tmp_path / "t"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    schema = (
        "href string, key string, modified timestamp, "
        "jsondata string, resourcetype string"
    )
    for path, n in (("/a", 3), ("/b", 2)):
        df = spark.createDataFrame(
            [(f"{path}/{i}", str(i), None, "{}", "T") for i in range(n)],
            schema,
        )
        table.replace_partition(df, BASEURL, path)
    table.pin_table("cut")
    snap = table.read_table_snapshot("cut").filter("path = '/a'")
    plan = snap._jdf.queryExecution().executedPlan().toString()
    # one scan, with the partition predicate pushed into PartitionFilters
    assert plan.count("Scan parquet") == 1
    assert "PartitionFilters" in plan and "path" in plan.split("PartitionFilters", 1)[1][:200]
    assert snap.count() == 3


def test_many_partition_manifest_read_is_one_scan(spark, tmp_path):
    """The 1k-partition guard: the manifest read must stay ONE multi-path
    scan (plan size O(1) in partition count). The earlier
    union-of-per-partition-scans design cost 58 s of planning at 1 000
    partitions (tools/partition_scale_probe.py); this pins the shape that
    keeps it ~2 s. read_partition resolves only its own manifest — its
    plan contains exactly that partition's files."""
    import shutil

    table = LakeTable(
        spark, str(tmp_path / "t"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    schema = (
        "href string, key string, modified timestamp, "
        "jsondata string, resourcetype string"
    )
    rows = spark.createDataFrame(
        [(f"/p0/{i}", str(i), None, "{}", "T") for i in range(5)], schema
    )
    table.replace_partition(rows, BASEURL, "/p0")
    proto = table._partition_dir(BASEURL, "/p0")
    parent = os.path.dirname(proto)
    n = 200
    for i in range(1, n):
        shutil.copytree(proto, os.path.join(parent, f"path=%2Fp{i}"))
    df = table.read()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # one scan, not n unioned scans
    assert df.count() == 5 * n
    one = table.read_partition(BASEURL, f"/p{n // 2}")
    assert one.count() == 5
    one_plan = one._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert f"p{n // 2}" in one_plan  # only its own version dir is scanned


def test_manifest_partition_value_encoding_roundtrip(spark, tmp_path):
    """Partition values parsed from the hive path segments must invert
    ``_encode`` exactly: null (``__HIVE_DEFAULT_PARTITION__``) and
    URL-quoted specials (space, %, /) round-trip through the multi-path
    scan and through the O(1) read_partition resolution."""
    table = LakeTable(
        spark, str(tmp_path / "t"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    schema = (
        "href string, key string, modified timestamp, "
        "jsondata string, resourcetype string"
    )
    rows = spark.createDataFrame([("/x/1", "1", None, "{}", "T")], schema)
    table.replace_partition(rows, None, None)
    table.replace_partition(rows, "https://b", "/a b/c%d")
    # non-ASCII values: Spark's unescapePathName decodes %XX PER CHAR, so
    # the encoder must leave multi-byte characters raw (UTF-8-byte quoting
    # reads back as mojibake, é -> Ã©)
    table.replace_partition(rows, "https://b/café", "/考试/路径")
    got = {(r.baseurl, r.path) for r in table.read().collect()}
    assert got == {
        (None, None),
        ("https://b", "/a b/c%d"),
        ("https://b/café", "/考试/路径"),
    }
    assert table.read_partition(None, None).count() == 1
    assert table.read_partition("https://b", "/a b/c%d").count() == 1
    assert table.read_partition("https://b/café", "/考试/路径").count() == 1


def test_lake_partition_pruning_on_manifest_backend(spark, tmp_path):
    """read_partition on the manifest backend folds the partition-literal
    filter per union child — only the matching partition's rows return."""
    table = LakeTable(
        spark, str(tmp_path / "t"), LAYOUT_LARGE, committer=ManifestCommitter()
    )
    schema = (
        "href string, key string, modified timestamp, "
        "jsondata string, resourcetype string"
    )
    for path, n in (("/a", 3), ("/b", 2)):
        df = spark.createDataFrame(
            [(f"{path}/{i}", str(i), None, "{}", "T") for i in range(n)],
            schema,
        )
        table.replace_partition(df, BASEURL, path)
    assert table.count() == 5
    assert table.read_partition(BASEURL, "/a").count() == 3
    assert table.read_partition(BASEURL, "/b").count() == 2
    assert table.read_partition(BASEURL, "/none").count() == 0


# ---------------------------------------------------------------------------
# compare-and-swap commits (concurrent writers)


def _stage_payload(c, dst, content):
    """Stage a version in place and drop one data file into it."""
    v = c.stage(dst)
    os.makedirs(v, exist_ok=True)
    with open(os.path.join(v, "a.parquet"), "w") as f:
        f.write(content)
    return v


@pytest.mark.parametrize("fs_cls", ["local", "objectstore"])
def test_cas_commit_conflict_preserves_winner_and_retry_converges(
    tmp_path, fs_cls
):
    """Two writers read the same basis and race their commits: the loser
    gets CommitConflict (its staged version and marker discarded), the
    winner's data stays current, and the loser's retry on the fresh basis
    succeeds. This is the lost-update protection for read-modify-write
    maintenance ops (compaction, retraction racing each other)."""
    from sri2db_spark.sinks.committer import CommitConflict
    from sri2db_spark.sinks.fs import LocalFS, ObjectStoreFS

    fs = {"local": LocalFS, "objectstore": ObjectStoreFS}[fs_cls]()
    c = ManifestCommitter(fs=fs)
    dst = str(tmp_path / "store")
    c.commit(_stage_payload(c, dst, "v0"), dst)

    basis = c.current_version(dst)
    a = _stage_payload(c, dst, "A")
    b = _stage_payload(c, dst, "B")
    c.commit(a, dst, expected_basis=basis)  # writer A wins
    with pytest.raises(CommitConflict):
        c.commit(b, dst, expected_basis=basis)  # writer B lost the race
    # winner preserved, loser's staged version gone
    phys = c.resolve(dst)
    assert open(os.path.join(phys, "a.parquet")).read() == "A"
    assert not os.path.isdir(b)
    # loser retries against the new basis: read-modify-write converges
    b2 = _stage_payload(c, dst, "B2")
    c.commit(b2, dst, expected_basis=c.current_version(dst))
    assert open(os.path.join(c.resolve(dst), "a.parquet")).read() == "B2"


def test_cas_first_commit_expects_absent_pointer(tmp_path):
    """expected_basis=None means 'nothing committed yet': it succeeds on a
    fresh store and conflicts when someone else committed first."""
    from sri2db_spark.sinks.committer import CommitConflict

    c = ManifestCommitter()
    dst = str(tmp_path / "store")
    c.commit(_stage_payload(c, dst, "first"), dst, expected_basis=None)
    assert open(os.path.join(c.resolve(dst), "a.parquet")).read() == "first"
    with pytest.raises(CommitConflict):
        c.commit(_stage_payload(c, dst, "late"), dst, expected_basis=None)
    assert open(os.path.join(c.resolve(dst), "a.parquet")).read() == "first"


def test_gc_spares_inflight_unmarked_stage(tmp_path):
    """A markerless v_* dir younger than stage_grace_s may be another
    writer's in-flight stage — commits (and their GC) must not collect it.
    With the grace elapsed (stage_grace_s=0 here), it is debris and goes."""
    c = ManifestCommitter(keep_versions=0)
    dst = str(tmp_path / "store")
    inflight = c.stage(dst)
    os.makedirs(inflight, exist_ok=True)
    with open(os.path.join(inflight, "partial.parquet"), "w") as f:
        f.write("still being written")
    for i in range(3):
        c.commit(_stage_payload(c, dst, f"v{i}"), dst)
    assert os.path.isdir(inflight)  # survived three GC passes
    impatient = ManifestCommitter(keep_versions=0, stage_grace_s=0.0)
    impatient.commit(_stage_payload(impatient, dst, "sweep"), dst)
    assert not os.path.isdir(inflight)  # grace elapsed -> debris collected


def test_put_if_proceeds_past_crashed_holder(tmp_path):
    """A CAS lock left by a crashed holder must not wedge the store: the
    flock a dead process held is released by the kernel, so the next
    put_if proceeds immediately (no staleness window, no steal)."""
    from sri2db_spark.sinks.fs import LocalFS

    fs = LocalFS()
    path = str(tmp_path / "obj")
    fs.put(path, "v1")
    # what a crashed holder leaves behind: the persistent lock file,
    # with no process holding its flock
    lock = str(tmp_path / ".obj.cas_lock")
    assert os.path.exists(lock)
    assert fs.put_if(path, "v2", "v1", stale_lock_s=60.0) is True
    assert fs.read(path) == "v2"
    assert os.path.exists(lock)  # persistent by design (never unlinked)


def test_rename_backend_rejects_conditional_commit(tmp_path):
    c = RenameCommitter()
    tmp = _write_dir(tmp_path / "t", {"a.parquet": "x"})
    with pytest.raises(NotImplementedError):
        c.commit(tmp, str(tmp_path / "dst"), expected_basis="v_x")


def test_fsspec_put_if_check_then_put_semantics(tmp_path):
    """The generic-fsspec CAS is read-check-put (AbstractFileSystem exposes
    no server-side precondition): it must catch the stale-basis writer —
    the lost-update case the committer guards — and it is opt-in
    (``allow_weak_cas=True``); without the opt-in it raises WeakCasError
    instead of silently racing (see test_fs_cas for the gating and the
    server-side S3/GCS bindings)."""
    from sri2db_spark.sinks.fs import FsspecFS

    from .fake_fsspec import FakeFsspecFileSystem

    fs = FsspecFS(FakeFsspecFileSystem(), allow_weak_cas=True)
    path = str(tmp_path / "obj")
    assert fs.put_if(path, "v1", None) is True       # create-if-absent
    assert fs.put_if(path, "clobber", None) is False # key exists now
    assert fs.put_if(path, "v2", "v1") is True       # matching basis
    assert fs.put_if(path, "v3", "v1") is False      # stale basis loses
    assert fs.read(path) == "v2"
