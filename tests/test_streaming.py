"""Streaming layer tests: event-triggered listener (D1-D4) and the
Structured Streaming foreachBatch merge path."""

from __future__ import annotations

import json
import threading
import time

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.operators.watermark import WatermarkStore
from sri2db_spark.sinks.lake import LakeTable
from sri2db_spark.sources.sri_api import SriApiReader
from sri2db_spark.streaming.listener import BroadcastListener
from sri2db_spark.streaming.stream_sync import stream_sync_from_files
from sri2db_spark.sync.engine import Sri2DbSync

from .fake_api import FakeSriApi

BASEURL = "https://fake.api"


def test_listener_triggers_sync_per_event(spark, tmp_path):
    api = FakeSriApi(n=6)
    sync = Sri2DbSync(
        reader=SriApiReader(spark, BASEURL, fetch_json=api.fetch_json, limit=3),
        table=LakeTable(spark, str(tmp_path / "t"), LAYOUT_LARGE),
        path="/a",
        baseurl=BASEURL,
        watermarks=WatermarkStore(spark, str(tmp_path / "wm")),
    )

    fired = threading.Event()

    def connect():
        yield {"type": "update"}
        fired.set()
        while not done.is_set():  # keep the "socket" open
            time.sleep(0.05)

    done = threading.Event()
    listener = BroadcastListener(connect=connect, sync_fn=sync.delta_sync).start()
    deadline = time.time() + 120
    while listener.syncs_run < 1 and time.time() < deadline:
        time.sleep(0.2)
    done.set()
    listener.stop()
    assert listener.events_seen == 1
    assert listener.syncs_run == 1
    assert sync.table.count() == 6


def test_listener_retries_failed_sync(spark):
    calls = {"n": 0}

    def flaky_sync():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return type("R", (), {"synctype": "DELTA"})()

    def connect():
        yield "update"
        while not stop.is_set():
            time.sleep(0.05)

    stop = threading.Event()
    listener = BroadcastListener(
        connect=connect, sync_fn=flaky_sync, retry_interval=0.05
    ).start()
    deadline = time.time() + 30
    while listener.syncs_run < 1 and time.time() < deadline:
        time.sleep(0.05)
    stop.set()
    listener.stop()
    assert calls["n"] == 3  # two failures + one success (D3 retry loop)
    assert listener.errors == 2


def test_listener_reconnects_on_source_failure(spark):
    attempts = {"n": 0}

    def connect():
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise ConnectionError("socket down")  # D2: reconnect
        yield "update"

    listener = BroadcastListener(
        connect=connect,
        sync_fn=lambda: type("R", (), {"synctype": "DELTA"})(),
        retry_interval=0.05,
    ).start()
    deadline = time.time() + 30
    while listener.syncs_run < 1 and time.time() < deadline:
        time.sleep(0.05)
    listener.stop()
    assert attempts["n"] == 2
    assert listener.syncs_run == 1


def test_stream_sync_merges_updates_and_tombstones(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    table = LakeTable(spark, str(tmp_path / "table"), LAYOUT_LARGE)

    def write_feed(name: str, records: list[dict]) -> None:
        (feed / name).write_text("\n".join(json.dumps(r) for r in records))

    def resource(i: int, modified: str, name: str = "x") -> dict:
        return {
            "href": f"/a/{i}",
            "resource": json.dumps(
                {
                    "$$meta": {"permalink": f"/a/{i}", "modified": modified, "type": "_A"},
                    "key": str(i),
                    "name": name,
                }
            ),
            "deleted": False,
        }

    write_feed(
        "batch1.json",
        [resource(i, "2020-01-01T00:00:00.000Z") for i in range(1, 6)],
    )
    q = stream_sync_from_files(
        spark,
        str(feed),
        table,
        LAYOUT_LARGE,
        BASEURL,
        "/a",
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)
    assert table.count() == 5

    # batch 2: one update, one tombstone, one insert
    write_feed(
        "batch2.json",
        [
            resource(2, "2021-01-01T00:00:00.000Z", name="v2"),
            {"href": "/a/4", "resource": None, "deleted": True},
            resource(9, "2021-01-01T00:00:00.000Z"),
        ],
    )
    q2 = stream_sync_from_files(
        spark,
        str(feed),
        table,
        LAYOUT_LARGE,
        BASEURL,
        "/a",
        str(tmp_path / "ckpt"),  # same checkpoint: only new files processed
        available_now=True,
    )
    q2.awaitTermination(300)
    rows = {r["href"]: r for r in table.read().collect()}
    assert set(rows) == {"/a/1", "/a/2", "/a/3", "/a/5", "/a/9"}
    assert json.loads(rows["/a/2"]["jsondata"])["name"] == "v2"


class _FakeSocketIoClient:
    """The socket.io client surface socketio_connect drives: on/connect/
    connected/disconnect/emit — backed by a shared script so the test can
    push events and kill the connection."""

    def __init__(self, script):
        self.script = script
        self.handlers = {}
        self.connected = False
        self.emitted = []
        script["clients"].append(self)

    def on(self, event, handler):
        self.handlers[event] = handler

    def connect(self, url):
        self.script["urls"].append(url)
        self.connected = True
        self.handlers["connect"]()

    def emit(self, event, data):
        self.emitted.append((event, data))

    def disconnect(self):
        self.connected = False

    def push(self, payload):
        self.handlers["update"](payload)


def test_socketio_adapter_drives_delta_sync(spark, tmp_path):
    """D1 with the reference's transport protocol: the socket.io adapter
    joins the room for the query-stripped path on connect
    (client.js:2004), yields one item per 'update' event (each triggering
    a delta sync), and surfaces a disconnect as an exception so the D2
    reconnect loop builds a fresh client and re-joins."""
    from sri2db_spark.streaming.listener import socketio_connect

    api = FakeSriApi(n=4)
    sync = Sri2DbSync(
        reader=SriApiReader(spark, BASEURL, fetch_json=api.fetch_json, limit=3),
        table=LakeTable(spark, str(tmp_path / "t2"), LAYOUT_LARGE),
        path="/a",
        baseurl=BASEURL,
        watermarks=WatermarkStore(spark, str(tmp_path / "wm2")),
    )
    script = {"clients": [], "urls": []}
    connect = socketio_connect(
        "https://broadcast.local", "/a?expand=FULL",
        client_factory=lambda: _FakeSocketIoClient(script),
        poll_interval=0.05,
    )
    listener = BroadcastListener(
        connect=connect, sync_fn=sync.delta_sync, retry_interval=0.1
    ).start()
    deadline = time.time() + 60
    while not script["clients"] and time.time() < deadline:
        time.sleep(0.02)
    c1 = script["clients"][0]
    assert c1.emitted == [("join", "/a")]  # room join, query string stripped
    c1.push({"type": "update"})
    while listener.syncs_run < 1 and time.time() < deadline:
        time.sleep(0.1)
    assert listener.syncs_run == 1
    assert sync.table.count() == 4
    # kill the connection: the adapter raises, the listener reconnects with
    # a SECOND client that re-joins the room
    c1.connected = False
    while len(script["clients"]) < 2 and time.time() < deadline:
        time.sleep(0.05)
    c2 = script["clients"][1]
    assert c2 is not c1 and c2.emitted == [("join", "/a")]
    # events on the new connection still trigger syncs
    api.update(2, modified="2030-01-01T00:00:00Z")
    c2.push({"type": "update"})
    while listener.syncs_run < 2 and time.time() < deadline:
        time.sleep(0.1)
    listener.stop()
    assert listener.syncs_run >= 2
    assert script["urls"] == ["https://broadcast.local"] * len(script["urls"])


def test_feed_helpers_tolerate_degenerate_splits(spark, tmp_path):
    """The registry streaming entries' feed plumbing: an all-equal-ts
    frame puts every row in batch 0 and an EMPTY batch 1 — the empty half
    must still land as a readable single parquet file (schema intact) so
    the 2-batch replay runs rather than erroring on a missing file."""
    from pyspark.sql import functions as F

    from sri2db_spark.plans.analytics import _feed_file, _time_split_feed

    df = spark.createDataFrame(
        [(i, 1_700_000_000_000_000_000) for i in range(10)],
        "user_id long, ts long",
    )
    feed = str(tmp_path / "feed")
    _time_split_feed(df, "ts", feed)
    import os

    names = sorted(os.listdir(feed))
    assert names == ["b0.parquet", "b1.parquet"]
    b0 = spark.read.schema("user_id long, ts long").parquet(f"{feed}/b0.parquet")
    b1 = spark.read.schema("user_id long, ts long").parquet(f"{feed}/b1.parquet")
    assert b0.count() == 10 and b1.count() == 0
    # mtime ordering is what the file source sorts on
    assert os.path.getmtime(f"{feed}/b0.parquet") < os.path.getmtime(
        f"{feed}/b1.parquet"
    )

    # empty input df: still one readable file
    _feed_file(df.filter(F.lit(False)), str(tmp_path / "f2"), "e.parquet", 500)
    e = spark.read.schema("user_id long, ts long").parquet(
        str(tmp_path / "f2" / "e.parquet")
    )
    assert e.count() == 0
