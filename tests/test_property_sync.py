"""Property-based sync tests (hypothesis): any mutation sequence, synced, must
reconcile exactly.

Model: the fake API's resource dict is ground truth. Invariants:
- after fullSync or safeDeltaSync the table equals the API state exactly
  (hrefs, payload names, modified stamps);
- hrefs are unique after every sync (page-shift dedup holds);
- deltaSync never resurrects a tombstoned href and applies every update
  whose modified exceeds the previous watermark.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.operators.watermark import WatermarkStore
from sri2db_spark.sinks.lake import LakeTable
from sri2db_spark.sources.sri_api import SriApiReader
from sri2db_spark.sync.engine import Sri2DbSync

from .fake_api import FakeSriApi

BASEURL = "https://fake.api"


def _ts(i: int) -> str:
    return f"2021-01-01T{i // 3600:02d}:{(i // 60) % 60:02d}:{i % 60:02d}.000Z"


# One mutation = (op, resource_index). Timestamps strictly increase with the
# mutation's position so delta scans see every change.
mutation = st.tuples(
    st.sampled_from(["update", "delete", "add", "drop_silently", "touch"]),
    st.integers(min_value=1, max_value=15),
)


def apply_mutations(api: FakeSriApi, muts, t0: int) -> None:
    for j, (op, i) in enumerate(muts):
        ts = _ts(t0 + j + 1)
        href = f"{api.path}/{i}"
        if op == "update" and href in api.resources:
            api.update(i, ts, name=f"v{t0 + j}")
        elif op == "touch" and href in api.resources:
            api.touch_without_change(i, ts)
        elif op == "delete" and href in api.resources:
            api.delete(i, ts)
        elif op == "drop_silently" and href in api.resources:
            api.drop_silently(i)
        elif op == "add" and href not in api.resources:
            api.add(i, ts)


def table_state(sync: Sri2DbSync) -> dict[str, str]:
    return {
        r["href"]: json.loads(r["jsondata"])["name"]
        for r in sync.table.read().collect()
    }


def api_state(api: FakeSriApi) -> dict[str, str]:
    return {href: r["name"] for href, r in api.resources.items()}


@pytest.fixture(scope="module")
def sync_factory(spark, tmp_path_factory):
    def make(api: FakeSriApi) -> Sri2DbSync:
        base = tmp_path_factory.mktemp("prop")
        return Sri2DbSync(
            reader=SriApiReader(spark, BASEURL, fetch_json=api.fetch_json, limit=3),
            table=LakeTable(spark, str(base / "table"), LAYOUT_LARGE),
            path=api.path,
            baseurl=BASEURL,
            layout=LAYOUT_LARGE,
            watermarks=WatermarkStore(spark, str(base / "wm")),
        )

    return make


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(muts1=st.lists(mutation, max_size=6), muts2=st.lists(mutation, max_size=6))
def test_safe_delta_always_reconciles_exactly(spark, sync_factory, muts1, muts2):
    api = FakeSriApi(n=8)
    sync = sync_factory(api)
    sync.full_sync()
    apply_mutations(api, muts1, 100)
    sync.safe_delta_sync()
    assert table_state(sync) == api_state(api)
    apply_mutations(api, muts2, 200)
    sync.safe_delta_sync()
    assert table_state(sync) == api_state(api)
    # uniqueness invariant
    df = sync.table.read()
    assert df.count() == df.select("href").distinct().count()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(muts=st.lists(mutation, max_size=8))
def test_delta_applies_updates_and_tombstones(spark, sync_factory, muts):
    api = FakeSriApi(n=8)
    sync = sync_factory(api)
    sync.full_sync()
    apply_mutations(api, muts, 100)
    sync.delta_sync()
    state = table_state(sync)
    # every tombstoned href is gone
    for href in api.deleted:
        assert href not in state
    # every surviving API resource with a post-sync modification is current
    for href, r in api.resources.items():
        if r["$$meta"]["modified"] >= "2021-01-01":
            assert state.get(href) == r["name"]
    # uniqueness after merge
    df = sync.table.read()
    assert df.count() == df.select("href").distinct().count()
