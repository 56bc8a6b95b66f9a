"""Crash matrix for the LAKE sync path.

A sync run has exactly two durable commits — the atomic partition publish
(`LakeTable.replace_partition`) and the watermark upsert
(`WatermarkStore.put`), both routed through one committer. The reference
gets the same guarantee from its single DB transaction
(client.js:468-597); ours comes from the commit protocol, so it must hold
under a crash at EVERY commit boundary:

- killed during the partition publish → the table still reads the
  previous committed state (old-or-new, never missing / partial);
- killed between the publish and the watermark write → the table holds
  the new state, the watermark is stale, and the next run simply
  refetches a wider window — the merge is idempotent;
- in every case a plain re-run of the same sync converges to exactly the
  state a crash-free run produces, and the crashed run's staged garbage
  never surfaces in reads.
"""

from __future__ import annotations

import pytest

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.operators.watermark import WatermarkStore
from sri2db_spark.sinks.committer import ManifestCommitter
from sri2db_spark.sinks.fs import LocalFS, ObjectStoreFS
from sri2db_spark.sinks.lake import LakeTable
from sri2db_spark.sources.sri_api import SriApiReader
from sri2db_spark.sync.engine import Sri2DbSync

from .fake_api import FakeSriApi

BASEURL = "https://fake.api"


class SimulatedCrash(RuntimeError):
    pass


class CrashingCommitter(ManifestCommitter):
    """Raises on the Nth commit() call (1-based); crash_at=None disables."""

    def __init__(self, fs=None):
        super().__init__(fs=fs)
        self.crash_at = None
        self.calls = 0

    def commit(self, *a, **kw):
        self.calls += 1
        if self.crash_at is not None and self.calls == self.crash_at:
            raise SimulatedCrash(f"killed at commit #{self.calls}")
        return super().commit(*a, **kw)

    def arm(self, at: int) -> None:
        self.crash_at, self.calls = at, 0

    def disarm(self) -> None:
        self.crash_at = None


def _make(spark, tmp_path, api, mc):
    reader = SriApiReader(spark, BASEURL, fetch_json=api.fetch_json, limit=4)
    table = LakeTable(
        spark, str(tmp_path / "table"), LAYOUT_LARGE, committer=mc
    )
    wm = WatermarkStore(spark, str(tmp_path / "synctimes"), committer=mc)
    return Sri2DbSync(
        reader=reader,
        table=table,
        path=api.path,
        baseurl=BASEURL,
        layout=LAYOUT_LARGE,
        watermarks=wm,
    )


def _rows(sync):
    return {
        r["href"]: r["jsondata"] for r in sync.table.read().collect()
    }


@pytest.mark.parametrize("fs_kind", ["local", "objectstore"])
@pytest.mark.parametrize("crash_commit", [1, 2])
def test_full_sync_crash_then_rerun_converges(
    spark, tmp_path, fs_kind, crash_commit
):
    fs = LocalFS() if fs_kind == "local" else ObjectStoreFS()
    mc = CrashingCommitter(fs=fs)
    api = FakeSriApi(n=7)
    sync = _make(spark, tmp_path, api, mc)

    # a clean first sync to establish prior state
    sync.full_sync()
    before = _rows(sync)
    wm_before = sync.watermarks.get("resources", BASEURL, "/a", "FULL")
    assert len(before) == 7 and wm_before[0] is not None

    # the source changes, then the next full sync crashes
    api.update(2, modified="2025-06-01T00:00:00Z", name="changed")
    mc.arm(crash_commit)
    with pytest.raises(SimulatedCrash):
        sync.full_sync()
    mc.disarm()

    mid = _rows(sync)
    if crash_commit == 1:
        # killed during the partition publish: table unchanged
        assert mid == before
        assert (
            sync.watermarks.get("resources", BASEURL, "/a", "FULL")
            == wm_before
        )
    else:
        # killed before the watermark write: table already new,
        # watermark stale — both are committed states, never partial
        assert '"changed"' in mid["/a/2"]
        assert (
            sync.watermarks.get("resources", BASEURL, "/a", "FULL")
            == wm_before
        )

    # plain re-run converges to the crash-free result
    r = sync.full_sync()
    assert r.rows_after == 7
    after = _rows(sync)
    assert '"changed"' in after["/a/2"]
    assert set(after) == set(before)
    wm_after = sync.watermarks.get("resources", BASEURL, "/a", "FULL")
    assert wm_after[0] is not None and wm_after != wm_before


@pytest.mark.parametrize("crash_commit", [1, 2])
def test_delta_sync_crash_then_rerun_converges(spark, tmp_path, crash_commit):
    mc = CrashingCommitter(fs=ObjectStoreFS())
    api = FakeSriApi(n=6)
    sync = _make(spark, tmp_path, api, mc)
    sync.full_sync()
    before = _rows(sync)

    # an update and a tombstone, then the delta crashes
    api.update(3, modified="2025-06-01T00:00:00Z", name="v2")
    api.delete(5, modified="2025-06-01T00:00:01Z")
    mc.arm(crash_commit)
    with pytest.raises(SimulatedCrash):
        sync.delta_sync()
    mc.disarm()

    mid = _rows(sync)
    if crash_commit == 1:
        assert mid == before  # delta publish is one atomic commit too
    else:
        assert "/a/5" not in mid and '"v2"' in mid["/a/3"]

    # re-run: the stale watermark refetches the same delta; the merge is
    # idempotent, so the result equals a crash-free delta
    r = sync.delta_sync()
    assert r.rows_after == 5
    after = _rows(sync)
    assert "/a/5" not in after
    assert '"v2"' in after["/a/3"]
    assert set(after) == set(before) - {"/a/5"}
    # and the DELTA watermark finally advanced
    assert (
        sync.watermarks.get("resources", BASEURL, "/a", "DELTA")[0]
        is not None
    )


def test_crashed_garbage_never_surfaces_and_is_reclaimed(spark, tmp_path):
    """The crashed run's staged version directory is invisible to readers
    and a later successful commit's GC sweeps it (after the in-flight
    grace window)."""
    mc = CrashingCommitter(fs=ObjectStoreFS())
    mc.stage_grace_s = 0  # crashed stages are immediately collectable
    api = FakeSriApi(n=5)
    sync = _make(spark, tmp_path, api, mc)
    sync.full_sync()

    api.update(1, modified="2025-06-01T00:00:00Z")
    mc.arm(1)
    with pytest.raises(SimulatedCrash):
        sync.full_sync()
    mc.disarm()

    store = sync.table._partition_dir(BASEURL, "/a")  # noqa: SLF001
    assert mc.resolve(store), "the first sync committed through the manifest"
    import os

    orphans = [
        d
        for d in mc.fs.listdir(store)
        if d.startswith("v_")
        and d != os.path.basename(mc.resolve(store))
    ]
    assert orphans, "the crashed publish left a staged version dir"

    # readers never see it; the next successful sync's GC reclaims it
    assert len(_rows(sync)) == 5
    sync.full_sync()
    left = {
        d for d in mc.fs.listdir(store) if d.startswith("v_")
    }
    assert os.path.basename(mc.resolve(store)) in left
    # everything beyond current + keep_versions retained dirs is gone,
    # including the crashed orphan
    assert len(left) <= 1 + mc.keep_versions
