"""LIVE JDBC end-to-end: staged bulk write + one-transaction server-side
merge against embedded Apache Derby (a real SQL database shipped with
Spark's jars) via the ANSI MERGE dialect.

This exercises the exact flow the reference runs against Postgres/MSSQL
(client.js:871-1239): Spark executors bulk-insert a staging table over
JDBC, then the driver executes the generated merge statements inside a
single DB transaction — update-if-changed, insert-if-absent, tombstone
delete, dry-run rollback. Derby folds unquoted identifiers to uppercase
and reserves ``key``, which is why the ANSI dialect quotes columns.
"""

from __future__ import annotations

import datetime as dt
import itertools

import pytest

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.operators.merge import dedup_latest
from sri2db_spark.sinks.jdbc import (
    JdbcResourceSink,
    generate_delta_sync_sql,
    generate_full_sync_sql,
)

_dbseq = itertools.count()

BASEURL = "https://db.api"
COLTYPES = (
    "href VARCHAR(200), key VARCHAR(64), modified TIMESTAMP, "
    "jsondata VARCHAR(2000), resourcetype VARCHAR(32), "
    "path VARCHAR(200), baseurl VARCHAR(200)"
)


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day, 12, 0, 0)


def _row(i: int, day: int, payload: str):
    return (
        f"/a/{i}",
        str(i),
        _ts(day),
        payload,
        "_A",
        "/a",
        BASEURL,
    )


@pytest.fixture()
def sink(spark):
    url = f"jdbc:derby:memory:e2e{next(_dbseq)};create=true"
    s = JdbcResourceSink(
        spark=spark,
        url=url,
        target_table="tgt",
        layout=LAYOUT_LARGE,
        properties={},
        dialect="ansi",
    )
    conn = s._connection()
    cols = ", ".join(
        f'"{c}" ' + t
        for c, t in [
            ("href", "VARCHAR(200)"),
            ("key", "VARCHAR(64)"),
            ("modified", "TIMESTAMP"),
            ("jsondata", "VARCHAR(2000)"),
            ("resourcetype", "VARCHAR(32)"),
            ("path", "VARCHAR(200)"),
            ("baseurl", "VARCHAR(200)"),
        ]
    )
    conn.createStatement().executeUpdate(f"CREATE TABLE tgt ({cols})")
    conn.close()
    yield s


def _staged(spark, rows):
    df = spark.createDataFrame(
        rows,
        "href string, key string, modified timestamp, jsondata string, "
        "resourcetype string, path string, baseurl string",
    )
    return df


def _read_target(spark, sink):
    df = spark.read.jdbc(sink.url, "tgt", properties={})
    return {r["href"]: r for r in df.collect()}


SCOPE = {"baseurl": BASEURL, "path": "/a"}


def test_full_sync_merge_mode_live(spark, sink):
    # pre-existing: one stale row (gets updated), one vanished row (deleted)
    pre = generate_full_sync_sql("tgt", "stg", LAYOUT_LARGE, SCOPE, True, "ansi")
    sink.write_staging(
        _staged(spark, [_row(1, 1, "stale"), _row(99, 1, "vanished")]),
        "stg",
        COLTYPES,
    )
    sink.merge(pre)

    # staged batch: duplicate href pages (Spark-side C1 keeps the newest),
    # a changed row, and a brand-new row
    staged = _staged(
        spark,
        [
            _row(1, 2, "old-page-dup"),
            _row(1, 3, "fresh"),
            _row(2, 3, "brand-new"),
        ],
    )
    deduped = dedup_latest(staged, LAYOUT_LARGE.key_columns)
    sink.write_staging(deduped, "stg", COLTYPES)
    stmts = generate_full_sync_sql("tgt", "stg", LAYOUT_LARGE, SCOPE, True, "ansi")
    sink.merge(stmts)

    got = _read_target(spark, sink)
    assert set(got) == {"/a/1", "/a/2"}  # /a/99 anti-join-deleted
    assert got["/a/1"]["jsondata"] == "fresh"  # newest page won, update applied
    assert got["/a/2"]["jsondata"] == "brand-new"


def test_delta_sync_update_insert_delete_live(spark, sink):
    sink.write_staging(
        _staged(
            spark,
            [_row(1, 1, "keep"), _row(2, 1, "to-update"), _row(3, 1, "to-delete")],
        ),
        "stg",
        COLTYPES,
    )
    sink.merge(generate_full_sync_sql("tgt", "stg", LAYOUT_LARGE, SCOPE, False, "ansi"))

    sink.write_staging(
        _staged(spark, [_row(2, 5, "updated"), _row(4, 5, "inserted")]),
        "stg_u",
        COLTYPES,
    )
    sink.write_staging(
        _staged(spark, [_row(3, 5, None)]).select(*LAYOUT_LARGE.key_columns),
        "stg_d",
        "href VARCHAR(200), path VARCHAR(200), baseurl VARCHAR(200)",
    )
    stmts = generate_delta_sync_sql("tgt", "stg_u", "stg_d", LAYOUT_LARGE, "ansi")
    sink.merge(stmts)

    got = _read_target(spark, sink)
    assert set(got) == {"/a/1", "/a/2", "/a/4"}
    assert got["/a/2"]["jsondata"] == "updated"
    assert got["/a/1"]["jsondata"] == "keep"
    # the no-op row kept its original modified (change detection skipped it)
    assert got["/a/1"]["modified"] == _ts(1)


def test_dry_run_rolls_back_live(spark, sink):
    sink.write_staging(_staged(spark, [_row(1, 1, "committed")]), "stg", COLTYPES)
    sink.merge(generate_full_sync_sql("tgt", "stg", LAYOUT_LARGE, SCOPE, False, "ansi"))

    sink.write_staging(_staged(spark, [_row(2, 2, "phantom")]), "stg", COLTYPES)
    stmts = generate_full_sync_sql("tgt", "stg", LAYOUT_LARGE, SCOPE, False, "ansi")
    sink.merge(stmts, dry_run=True)

    got = _read_target(spark, sink)
    assert set(got) == {"/a/1"}  # the dry-run DELETE+INSERT fully rolled back
    assert got["/a/1"]["jsondata"] == "committed"


def test_merge_is_one_transaction_live(spark, sink):
    """A failing statement mid-merge must leave the target untouched —
    the whole statement list is one transaction (D6)."""
    sink.write_staging(_staged(spark, [_row(1, 1, "base")]), "stg", COLTYPES)
    sink.merge(generate_full_sync_sql("tgt", "stg", LAYOUT_LARGE, SCOPE, False, "ansi"))

    sink.write_staging(_staged(spark, [_row(2, 2, "half")]), "stg", COLTYPES)
    stmts = generate_full_sync_sql("tgt", "stg", LAYOUT_LARGE, SCOPE, False, "ansi")
    stmts.append("INSERT INTO does_not_exist VALUES (1)")
    with pytest.raises(Exception, match="does_not_exist|DOES_NOT_EXIST|42"):
        sink.merge(stmts)
    got = _read_target(spark, sink)
    assert set(got) == {"/a/1"}
    assert got["/a/1"]["jsondata"] == "base"


def test_discover_layout_live(spark, sink):
    """A9 against a LIVE catalog: the Derby system-table probe discovers the
    full optional-column layout of the real target table."""
    from sri2db_spark.sinks.jdbc import discover_layout_jdbc

    layout = discover_layout_jdbc(spark, sink.url, "TGT", {}, "derby")
    assert layout.key_columns == ("baseurl", "path", "href")
    assert layout.has_resourcetype


# ---- the reference's full combinatorial surface, LIVE --------------------
# 3 table layouts (sri2db_large/medium/small, ref
# docker/postgres_initdb/initdb.sql:2-11) x 2 full-sync strategies
# (delete-all, ref client.js:999-1005 / merge, client.js:1006-1111) x 3
# synctypes (full/delta/safeDelta). For delta/safe the strategy flag is a
# no-op in the reference too (preferUpdatesOverInserts only alters fullSync
# SQL), so those cells assert strategy-invariance of the result.

from sri2db_spark.model.schema import LAYOUT_MEDIUM, LAYOUT_SMALL
from sri2db_spark.sinks.jdbc import generate_safe_delta_sql

_TYPE_MAP = {
    "href": "VARCHAR(200)",
    "key": "VARCHAR(64)",
    "modified": "TIMESTAMP",
    "jsondata": "VARCHAR(2000)",
    "resourcetype": "VARCHAR(32)",
    "path": "VARCHAR(200)",
    "baseurl": "VARCHAR(200)",
}
_SPARK_TYPES = {
    "href": "string", "key": "string", "modified": "timestamp",
    "jsondata": "string", "resourcetype": "string",
    "path": "string", "baseurl": "string",
}


def _mk_sink(spark, layout):
    url = f"jdbc:derby:memory:mx{next(_dbseq)};create=true"
    s = JdbcResourceSink(
        spark=spark, url=url, target_table="tgt", layout=layout,
        properties={}, dialect="ansi",
    )
    conn = s._connection()
    cols = ", ".join(f'"{c}" {_TYPE_MAP[c]}' for c in layout.columns)
    conn.createStatement().executeUpdate(f"CREATE TABLE tgt ({cols})")
    conn.close()
    return s


def _staged_for(spark, layout, specs):
    full = {
        "path": "/a",
        "baseurl": BASEURL,
        "resourcetype": "_A",
    }
    rows = []
    for i, day, payload in specs:
        r = dict(full, href=f"/a/{i}", key=str(i), modified=_ts(day), jsondata=payload)
        rows.append(tuple(r[c] for c in layout.columns))
    schema = ", ".join(f"{c} {_SPARK_TYPES[c]}" for c in layout.columns)
    return spark.createDataFrame(rows, schema)


def _coltypes_for(layout, cols=None):
    cols = cols or layout.columns
    return ", ".join(f"{c} {_TYPE_MAP[c]}" for c in cols)


@pytest.mark.parametrize("synctype", ["full", "delta", "safe"])
@pytest.mark.parametrize("merge_mode", [False, True], ids=["delete_all", "merge"])
@pytest.mark.parametrize(
    "layout",
    [LAYOUT_LARGE, LAYOUT_MEDIUM, LAYOUT_SMALL],
    ids=["large", "medium", "small"],
)
def test_live_merge_matrix(spark, layout, merge_mode, synctype):
    sink = _mk_sink(spark, layout)
    scope = {
        c: (BASEURL if c == "baseurl" else "/a")
        for c in layout.partition_columns
    }
    # seed {1, 2, 3} via delete-all full sync
    sink.write_staging(
        _staged_for(spark, layout, [(1, 1, "one"), (2, 1, "two"), (3, 1, "three")]),
        "stg", _coltypes_for(layout),
    )
    sink.merge(generate_full_sync_sql("tgt", "stg", layout, scope, False, "ansi"))

    if synctype == "full":
        # changed row 1, unchanged row 2, new row 4; row 3 vanished upstream
        sink.write_staging(
            _staged_for(
                spark, layout, [(1, 3, "one-v2"), (2, 1, "two"), (4, 3, "four")]
            ),
            "stg", _coltypes_for(layout),
        )
        sink.merge(
            generate_full_sync_sql("tgt", "stg", layout, scope, merge_mode, "ansi")
        )
        expected = {"/a/1": "one-v2", "/a/2": "two", "/a/4": "four"}
    elif synctype == "delta":
        sink.write_staging(
            _staged_for(spark, layout, [(2, 5, "two-v2"), (5, 5, "five")]),
            "stg_u", _coltypes_for(layout),
        )
        sink.write_staging(
            _staged_for(spark, layout, [(3, 5, None)]).select(*layout.key_columns),
            "stg_d", _coltypes_for(layout, layout.key_columns),
        )
        sink.merge(
            generate_delta_sync_sql("tgt", "stg_u", "stg_d", layout, "ansi")
        )
        expected = {"/a/1": "one", "/a/2": "two-v2", "/a/5": "five"}
    else:  # safe delta: upsert batch + set-difference delete vs membership
        sink.write_staging(
            _staged_for(spark, layout, [(2, 5, "two-v2"), (6, 5, "six")]),
            "stg_u", _coltypes_for(layout),
        )
        sink.write_staging(
            _staged_for(
                spark, layout, [(1, 5, None), (2, 5, None), (6, 5, None)]
            ).select(*layout.key_columns),
            "stg_m", _coltypes_for(layout, layout.key_columns),
        )
        sink.merge(
            generate_safe_delta_sql("tgt", "stg_u", "stg_m", layout, scope, "ansi")
        )
        expected = {"/a/1": "one", "/a/2": "two-v2", "/a/6": "six"}

    got = _read_target(spark, sink)
    assert {h: r["jsondata"] for h, r in got.items()} == expected
    if synctype == "full" and merge_mode:
        # merge mode change-detection: the unchanged row kept its original
        # modified (the no-op write was skipped server-side)
        assert got["/a/2"]["modified"] == _ts(1)
    # layout columns round-tripped (the optional-column matrix point)
    assert set(got["/a/2"].asDict()) == set(layout.columns)


def test_stage_like_target_live(spark, sink):
    """Like-target staging end to end on a live engine: the staging tables
    are created FROM THE TARGET'S SCHEMA server-side (client.js:809/:839
    design) and Spark APPENDS into them — the flow a pg jsonb target needs,
    here proven against Derby including re-staging (drop/recreate), a
    key-only deletes table, and the one-transaction merge."""
    sink.stage_like_target = True

    staged = _staged(spark, [_row(1, 1, "one"), _row(2, 1, "two")])
    sink.write_staging(staged, "stg")
    sink.merge(generate_full_sync_sql("tgt", "stg", LAYOUT_LARGE, SCOPE, True, "ansi"))
    assert {h: r["jsondata"] for h, r in _read_target(spark, sink).items()} == {
        "/a/1": "one",
        "/a/2": "two",
    }

    # second round re-stages (drop + recreate + append) and carries a
    # key-only tombstone staging table, also inherited from the target
    upd = _staged(spark, [_row(2, 2, "two-v2"), _row(3, 2, "three")])
    sink.write_staging(upd, "stg")
    dels = _staged(spark, [_row(1, 2, None)]).select(*LAYOUT_LARGE.key_columns)
    sink.write_staging(dels, "stg_del")
    sink.merge(generate_delta_sync_sql("tgt", "stg", "stg_del", LAYOUT_LARGE, "ansi"))
    assert {h: r["jsondata"] for h, r in _read_target(spark, sink).items()} == {
        "/a/2": "two-v2",
        "/a/3": "three",
    }
