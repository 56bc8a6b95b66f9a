"""End-to-end API→live-DB sync engine tests on embedded Derby: the full
reference deployment shape (paged API scan → Spark staging/dedup → bulk
JDBC staging write → one-transaction server-side merge → watermarks)."""

from __future__ import annotations

import itertools

import pytest

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.operators.watermark import WatermarkStore
from sri2db_spark.sinks.jdbc import JdbcResourceSink
from sri2db_spark.sources.sri_api import SriApiReader
from sri2db_spark.sync.jdbc_engine import Sri2DbJdbcSync

from .fake_api import FakeSriApi

BASEURL = "https://fake.api"
COLTYPES = (
    "href VARCHAR(200), key VARCHAR(64), modified TIMESTAMP, "
    "jsondata VARCHAR(4000), resourcetype VARCHAR(32), "
    "path VARCHAR(200), baseurl VARCHAR(200)"
)
_dbseq = itertools.count()


@pytest.fixture()
def db_sync(spark, tmp_path):
    api = FakeSriApi(n=10, page_size=3)
    url = f"jdbc:derby:memory:eng{next(_dbseq)};create=true"
    sink = JdbcResourceSink(
        spark=spark,
        url=url,
        target_table="resources",
        layout=LAYOUT_LARGE,
        properties={},
        dialect="ansi",
    )
    conn = sink._connection()
    cols = ", ".join(
        f'"{c}" {t}'
        for c, t in [
            ("href", "VARCHAR(200)"), ("key", "VARCHAR(64)"),
            ("modified", "TIMESTAMP"), ("jsondata", "VARCHAR(4000)"),
            ("resourcetype", "VARCHAR(32)"), ("path", "VARCHAR(200)"),
            ("baseurl", "VARCHAR(200)"),
        ]
    )
    conn.createStatement().executeUpdate(f"CREATE TABLE resources ({cols})")
    conn.close()
    sync = Sri2DbJdbcSync(
        reader=SriApiReader(spark, BASEURL, fetch_json=api.fetch_json, limit=3),
        sink=sink,
        path=api.path,
        baseurl=BASEURL,
        layout=LAYOUT_LARGE,
        watermarks=WatermarkStore(spark, str(tmp_path / "wm")),
        staging_column_types=COLTYPES,
    )
    return api, sync


def _db_rows(spark, sink):
    df = spark.read.jdbc(sink.url, "resources", properties={})
    return {r["href"]: r for r in df.collect()}


def test_full_sync_into_live_db(spark, db_sync):
    api, sync = db_sync
    res = sync.full_sync()
    assert res.synctype == "FULL"
    assert res.resources_synced == 10
    assert res.rows_after == 10
    rows = _db_rows(spark, sync.sink)
    assert set(rows) == {f"/a/{i}" for i in range(1, 11)}
    assert rows["/a/7"]["key"] == "7"
    assert rows["/a/7"]["baseurl"] == BASEURL


def test_delta_sync_update_delete_insert_live_db(spark, db_sync):
    api, sync = db_sync
    sync.full_sync()
    api.update(5, modified="2031-01-01T00:00:00Z", name="renamed")
    api.delete(7, modified="2031-01-02T00:00:00Z")
    api.add(11, modified="2031-01-03T00:00:00Z")

    res = sync.delta_sync()
    assert res.deletes_synced == 1
    assert res.rows_after == 10  # 10 - deleted + added
    rows = _db_rows(spark, sync.sink)
    assert "/a/7" not in rows
    assert "/a/11" in rows
    assert '"renamed"' in rows["/a/5"]["jsondata"]


def test_repeat_full_sync_idempotent_live_db(spark, db_sync):
    api, sync = db_sync
    sync.full_sync()
    res = sync.full_sync()
    assert res.rows_after == 10
    assert len(_db_rows(spark, sync.sink)) == 10


def test_dry_run_leaves_db_unchanged(spark, db_sync):
    api, sync = db_sync
    sync.full_sync()
    api.add(12, modified="2031-01-01T00:00:00Z")
    sync.dry_run = True
    res = sync.full_sync()
    assert res.dry_run
    assert len(_db_rows(spark, sync.sink)) == 10  # rolled back


def test_safe_delta_sync_reconciles_live_db(spark, db_sync):
    """Safe delta against a live DB: silent membership exits are deleted
    (C7), watermark-missed additions are gap-fetched and inserted (C8/C9),
    and normal updates still apply — all in one server-side transaction."""
    api, sync = db_sync
    sync.full_sync()

    api.update(5, modified="2031-01-01T00:00:00Z", name="safely-updated")
    api.drop_silently(4)  # membership exit without a tombstone
    # an addition whose modified PREDATES the watermark: the delta scan
    # misses it; only membership reconciliation can find it
    api.add(11, modified="1990-01-01T00:00:00Z")

    res = sync.safe_delta_sync()
    assert res.synctype == "SAFEDELTA"
    rows = _db_rows(spark, sync.sink)
    assert "/a/4" not in rows  # C7 set-difference delete
    assert "/a/11" in rows  # C8/C9 gap insert
    assert '"safely-updated"' in rows["/a/5"]["jsondata"]
    assert len(rows) == 10  # 10 - dropped + gap-added
    assert res.rows_after == 10


def test_broadcast_triggered_delta_into_live_db(spark, db_sync):
    """D1 against a live DB: a broadcast event triggers the delta sync,
    which lands the change in the database."""
    import queue

    from sri2db_spark.streaming.listener import BroadcastListener

    api, sync = db_sync
    sync.full_sync()
    api.update(2, modified="2031-01-01T00:00:00Z", name="via-broadcast")

    events: queue.Queue = queue.Queue()

    def connect():
        while True:
            ev = events.get()
            if ev is None:
                return
            yield ev

    listener = BroadcastListener(
        connect=connect, sync_fn=sync.delta_sync, retry_interval=0.2
    ).start()
    events.put("update")
    deadline = __import__("time").time() + 60
    while listener.syncs_run < 1 and __import__("time").time() < deadline:
        __import__("time").sleep(0.2)
    events.put(None)
    listener.stop()
    assert listener.syncs_run >= 1
    rows = _db_rows(spark, sync.sink)
    assert '"via-broadcast"' in rows["/a/2"]["jsondata"]


def test_default_staging_table_is_unique_per_sync_scope():
    """The reference's staging is SESSION-temp and cannot collide across
    concurrent syncs into one database (client.js:806-843); ours are
    regular tables, so the default name must differ per (target, baseurl,
    path) or a second endpoint's sync would drop/overwrite the first's
    staging mid-merge — and stay deterministic so re-runs replace their
    own leftovers."""

    def mk(path, baseurl="https://x", target="resources"):
        sink = JdbcResourceSink(
            spark=None, url="jdbc:none", target_table=target,
            layout=LAYOUT_LARGE, properties={},
        )
        return Sri2DbJdbcSync(reader=None, sink=sink, path=path, baseurl=baseurl)

    a, b = mk("/persons"), mk("/schools")
    assert a.staging_table != b.staging_table
    assert a.staging_table.startswith("stg_sri2db_")
    assert mk("/persons").staging_table == a.staging_table  # deterministic
    assert mk("/persons", baseurl="https://y").staging_table != a.staging_table
    assert mk("/persons", target="other").staging_table != a.staging_table
    # query strings don't fork the name (scope uses the clean path)
    assert mk("/persons?limit=5").staging_table == a.staging_table
    # explicit override still wins
    sink = JdbcResourceSink(
        spark=None, url="jdbc:none", target_table="resources",
        layout=LAYOUT_LARGE, properties={},
    )
    s = Sri2DbJdbcSync(reader=None, sink=sink, path="/p", staging_table="my_stg")
    assert s.staging_table == "my_stg"


def test_staging_tables_are_per_run_and_dropped(spark):
    """Session-temp analog: each run stages into nonce-suffixed tables and
    drops them when it ends (success or failure), so concurrent drivers on
    the same scope can't clobber each other and dry-runs leave nothing
    behind (client.js:806-843 + ON COMMIT DROP)."""
    api = FakeSriApi(path="/persons", n=7)
    reader = SriApiReader(spark, "https://x", limit=5, fetch_json=api.fetch_json)
    url = f"jdbc:derby:memory:stgrun{next(_dbseq)};create=true"
    sink = JdbcResourceSink(
        spark=spark, url=url, target_table="tgt", layout=LAYOUT_LARGE,
        properties={}, dialect="ansi",
    )
    conn = sink._connection()
    cols = ", ".join(
        f'"{c}" VARCHAR(2000)' if c != "modified" else '"modified" TIMESTAMP'
        for c in LAYOUT_LARGE.columns
    )
    conn.createStatement().executeUpdate(f"CREATE TABLE tgt ({cols})")
    conn.close()

    sync = Sri2DbJdbcSync(
        reader=reader, sink=sink, path="/persons", baseurl="https://x",
        staging_column_types=", ".join(
            f"{c} VARCHAR(2000)" if c != "modified" else "modified TIMESTAMP"
            for c in LAYOUT_LARGE.columns
        ),
    )
    r = sync.full_sync()
    assert r.rows_after == 7

    def staging_leftovers():
        c = sink._connection()
        try:
            rs = c.createStatement().executeQuery(
                "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'"
            )
            names = []
            while rs.next():
                names.append(rs.getString(1))
            return [n for n in names if n.upper().startswith("STG_SRI2DB")]
        finally:
            c.close()

    assert staging_leftovers() == []  # dropped after the merge

    api.update(2, modified="2025-06-01T00:00:00Z")
    r2 = sync.delta_sync()
    assert r2.rows_after == 7
    assert staging_leftovers() == []  # delta run (incl. tombstone table) too


def test_failed_staging_write_leaves_no_orphan_table(spark):
    """A bulk insert that dies AFTER creating its nonce-named staging
    table must still get that table dropped by the run's cleanup — with
    per-run nonce names no later run ever reuses the name, so an orphan
    here would live forever (unlike the old fixed-name design)."""
    api = FakeSriApi(path="/persons", n=5)
    reader = SriApiReader(spark, "https://x", limit=5, fetch_json=api.fetch_json)
    url = f"jdbc:derby:memory:stgfail{next(_dbseq)};create=true"
    sink = JdbcResourceSink(
        spark=spark, url=url, target_table="tgt", layout=LAYOUT_LARGE,
        properties={}, dialect="ansi",
    )
    conn = sink._connection()
    cols = ", ".join(
        f'"{c}" VARCHAR(2000)' if c != "modified" else '"modified" TIMESTAMP'
        for c in LAYOUT_LARGE.columns
    )
    conn.createStatement().executeUpdate(f"CREATE TABLE tgt ({cols})")
    conn.close()

    real_write = sink.write_staging

    def dying_write(df, table, *a, **kw):
        real_write(df.limit(0), table, *a, **kw)  # table exists, no rows
        raise RuntimeError("connection lost mid bulk insert")

    sink.write_staging = dying_write
    sync = Sri2DbJdbcSync(
        reader=reader, sink=sink, path="/persons", baseurl="https://x",
        staging_column_types=", ".join(
            f"{c} VARCHAR(2000)" if c != "modified" else "modified TIMESTAMP"
            for c in LAYOUT_LARGE.columns
        ),
    )
    with pytest.raises(RuntimeError, match="mid bulk insert"):
        sync.full_sync()

    c = sink._connection()
    try:
        rs = c.createStatement().executeQuery(
            "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'"
        )
        names = []
        while rs.next():
            names.append(rs.getString(1))
    finally:
        c.close()
    assert [n for n in names if n.upper().startswith("STG_SRI2DB")] == []
