"""LIVE execution of the POSTGRESQL-dialect merge SQL on DuckDB.

The reference's primary target is Postgres (client.js:871-1239); this
sandbox has no Postgres server, and until now the pg dialect was pinned
only as statement TEXT (golden files) while live execution ran through
Derby's ANSI dialect. DuckDB natively executes the Postgres constructs
the generator emits — ``UPDATE … FROM``, ``DELETE … USING``,
``IS NOT DISTINCT FROM``, window-function dedup subqueries, correlated
``NOT EXISTS`` — so every pg statement here runs end to end against real
tables with a hand-computed expected outcome, covering the exact
semantic edges the goldens pin:

- change-detection update with the null-aware ``<>`` triple
  (client.js:1064): NULL→value and value→NULL both update; equal values
  do not,
- full-sync anti-join delete scoped to (baseurl, path) — out-of-scope
  rows with the SAME href are never touched,
- latest-wins ROW_NUMBER dedup before insert-if-absent,
- delta tombstone ``DELETE … USING`` semi-join,
- safe-delta set-difference delete with the scope re-check
  (client.js:1138) — a missing member's href in ANOTHER scope survives,
- transaction scope: a ROLLBACK restores the pre-merge table (D6).

What this does NOT cover (documented residue): jsonb's key-order-
normalizing equality (pg compares jsonb structurally; DuckDB's JSON
compares as text) and server-side temp-table lifetime. The jsonb TYPE
path itself — staging inherited from a JSON-typed target via the
generator's like-target DDL, merge statements running castless against
it — executes live in test_pg_staging_inherits_json_target_type, and the
null-aware change-detecting UPDATE runs against the JSON-typed column in
test_pg_json_target_null_aware_change_detection.
"""

from __future__ import annotations

import duckdb
import pytest

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.sinks.jdbc import (
    generate_delta_sync_sql,
    generate_full_sync_sql,
    generate_safe_delta_sql,
)

BASEURL = "https://db.api"
SCOPE = {"baseurl": BASEURL, "path": "/a"}
COLS = "(href VARCHAR, key VARCHAR, modified TIMESTAMP, jsondata VARCHAR, resourcetype VARCHAR, path VARCHAR, baseurl VARCHAR)"


def _conn():
    con = duckdb.connect()
    for t in ("resources", "stg", "stg_upd", "stg_del", "stg_members"):
        con.execute(f"CREATE TABLE {t} {COLS}")
    return con


def _ins(con, table, rows):
    con.executemany(
        f"INSERT INTO {table} VALUES (?, ?, ?, ?, ?, ?, ?)", rows
    )


def _row(href, jsondata, day=1, path="/a", baseurl=BASEURL):
    return (
        href,
        href.rsplit("/", 1)[-1],
        f"2024-01-{day:02d} 12:00:00",
        jsondata,
        "_A",
        path,
        baseurl,
    )


def _target(con):
    return {
        (r[0], r[5], r[6]): r[3]
        for r in con.execute(
            "SELECT href, key, modified, jsondata, resourcetype, path, "
            "baseurl FROM resources"
        ).fetchall()
    }


def _seed_target(con):
    _ins(
        con,
        "resources",
        [
            _row("/a/1", "same"),        # unchanged -> no update
            _row("/a/2", "old"),         # changed -> update
            _row("/a/3", None),          # NULL -> value (null-aware)
            _row("/a/4", "will-null"),   # value -> NULL (null-aware)
            _row("/a/5", "gone"),        # absent from staging
            _row("/a/5", "other-scope", baseurl="https://other.api"),
        ],
    )


STAGING = [
    _row("/a/1", "same"),
    _row("/a/2", "new"),
    _row("/a/3", "filled"),
    _row("/a/4", None),
    _row("/a/6", "stale", day=2),  # duplicate pair: latest must win
    _row("/a/6", "latest", day=3),
]


@pytest.mark.parametrize("mode", ["full_merge", "full_delete_all"])
def test_pg_full_sync_executes_with_reference_semantics(mode):
    con = _conn()
    _seed_target(con)
    _ins(con, "stg", STAGING)
    sqls = generate_full_sync_sql(
        "resources",
        "stg",
        LAYOUT_LARGE,
        SCOPE,
        prefer_updates_over_inserts=(mode == "full_merge"),
        dialect="postgresql",
    )
    con.execute("BEGIN")
    for s in sqls:
        con.execute(s)
    con.execute("COMMIT")
    got = _target(con)
    assert got == {
        ("/a/1", "/a", BASEURL): "same",
        ("/a/2", "/a", BASEURL): "new",
        ("/a/3", "/a", BASEURL): "filled",
        ("/a/4", "/a", BASEURL): None,
        ("/a/6", "/a", BASEURL): "latest",  # dedup kept the newest
        # the anti-join delete re-checked scope: same-href other-scope
        # row survived the full sync of (BASEURL, /a)
        ("/a/5", "/a", "https://other.api"): "other-scope",
    }


def test_pg_full_sync_change_detection_skips_identical_rows():
    """The null-aware predicate must not rewrite identical rows: with an
    all-identical staging, the UPDATE touches zero rows (the reference
    counts updated rows for its metrics — client.js:1064)."""
    con = _conn()
    _seed_target(con)
    _ins(con, "stg", [_row("/a/1", "same")])
    sqls = generate_full_sync_sql(
        "resources",
        "stg",
        LAYOUT_LARGE,
        SCOPE,
        prefer_updates_over_inserts=True,
        dialect="postgresql",
    )
    update = next(s for s in sqls if s.startswith("UPDATE"))
    n = con.execute(update).fetchone()[0]
    assert n == 0


def test_pg_delta_sync_executes_with_reference_semantics():
    con = _conn()
    _seed_target(con)
    _ins(
        con,
        "stg_upd",
        [
            _row("/a/2", "new"),
            _row("/a/4", None),
            _row("/a/6", "stale", day=2),
            _row("/a/6", "latest", day=3),
        ],
    )
    _ins(con, "stg_del", [_row("/a/5", "tombstone")])
    sqls = generate_delta_sync_sql(
        "resources", "stg_upd", "stg_del", LAYOUT_LARGE, dialect="postgresql"
    )
    con.execute("BEGIN")
    for s in sqls:
        con.execute(s)
    con.execute("COMMIT")
    got = _target(con)
    assert got == {
        ("/a/1", "/a", BASEURL): "same",   # untouched by delta
        ("/a/2", "/a", BASEURL): "new",
        ("/a/3", "/a", BASEURL): None,     # not in stg_upd: kept as-is
        ("/a/4", "/a", BASEURL): None,
        ("/a/6", "/a", BASEURL): "latest",
        # tombstone delete is an exact-key semi-join: the same href in
        # another scope is NOT deleted
        ("/a/5", "/a", "https://other.api"): "other-scope",
    }


def test_pg_safe_delta_scope_recheck_spares_other_scopes():
    """C7 set-difference delete: rows of THIS scope missing from the
    member snapshot are deleted; a row with the same href in another
    scope survives because the delete re-checks scope (client.js:1138)."""
    con = _conn()
    _seed_target(con)
    _ins(con, "stg_upd", [_row("/a/2", "new")])
    # membership snapshot: /a/5 (and /a/5 only among the to-delete
    # candidates) is MISSING -> delete it from (BASEURL, /a) only
    _ins(
        con,
        "stg_members",
        [_row(h, None) for h in ("/a/1", "/a/2", "/a/3", "/a/4")],
    )
    sqls = generate_safe_delta_sql(
        "resources",
        "stg_upd",
        "stg_members",
        LAYOUT_LARGE,
        SCOPE,
        dialect="postgresql",
    )
    con.execute("BEGIN")
    for s in sqls:
        con.execute(s)
    con.execute("COMMIT")
    got = _target(con)
    assert ("/a/5", "/a", BASEURL) not in got  # set-difference delete
    assert got[("/a/5", "/a", "https://other.api")] == "other-scope"
    assert got[("/a/2", "/a", BASEURL)] == "new"
    assert got[("/a/1", "/a", BASEURL)] == "same"


def test_pg_transaction_rollback_restores_pre_merge_state():
    """D6 dry-run parity: the same statements inside BEGIN…ROLLBACK leave
    the table byte-identical (the reference runs every merge in one
    transaction and dry-run rolls it back, client.js:869-1040)."""
    con = _conn()
    _seed_target(con)
    _ins(con, "stg", STAGING)
    before = _target(con)
    sqls = generate_full_sync_sql(
        "resources",
        "stg",
        LAYOUT_LARGE,
        SCOPE,
        prefer_updates_over_inserts=True,
        dialect="postgresql",
    )
    con.execute("BEGIN")
    for s in sqls:
        con.execute(s)
    con.execute("ROLLBACK")
    assert _target(con) == before


def test_pg_staging_inherits_json_target_type():
    """The jsonb story, executed: the target's jsondata is a JSON column
    (the reference's own e2e DDL, client.js:1715 ``jsondata jsonb``), the
    staging table is created from the target's schema via the generator's
    pg DDL (client.js:839-843 design), and the full merge statement set
    runs against the typed columns with no casts in the SQL — exactly why
    like-target staging exists. DuckDB executes the same DDL shape
    (``CREATE TABLE … AS SELECT * FROM … LIMIT 0``; UNLOGGED is a pg
    storage attribute with no DuckDB spelling, so the generator is asked
    for a plain table). Residue shrinks to: jsonb's KEY-ORDER-normalizing
    equality — pg compares jsonb structurally, DuckDB's JSON falls back to
    text comparison — and server-side temp-table lifetime."""
    from sri2db_spark.sinks.jdbc import staging_ddl

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE resources (href VARCHAR, key VARCHAR, modified "
        "TIMESTAMP, jsondata JSON, resourcetype VARCHAR, path VARCHAR, "
        "baseurl VARCHAR)"
    )
    for sql in staging_ddl("stg", "resources", "postgresql", unlogged=False):
        con.execute(sql)
    # staging inherited the JSON type from the target
    (stg_type,) = con.execute(
        "SELECT data_type FROM information_schema.columns "
        "WHERE table_name = 'stg' AND column_name = 'jsondata'"
    ).fetchone()
    assert stg_type == "JSON"

    _ins(con, "resources", [_row("/a/1", '{"v": 1}'), _row("/a/2", '{"v": 2}')])
    _ins(con, "stg", [_row("/a/2", '{"v": 22}', day=2), _row("/a/3", '{"v": 3}', day=2)])
    for sql in generate_full_sync_sql(
        "resources", "stg", LAYOUT_LARGE, SCOPE, True, "postgresql"
    ):
        con.execute(sql)
    got = {
        r[0]: r[1]
        for r in con.execute("SELECT href, jsondata FROM resources").fetchall()
    }
    assert set(got) == {"/a/2", "/a/3"}  # /a/1 anti-join-deleted
    assert '"v": 22' in got["/a/2"] or '"v":22' in got["/a/2"]

    # key-only staging (deletes/membership) inherits the subset schema
    for sql in staging_ddl(
        "stg_del2", "resources", "postgresql",
        columns=("baseurl", "path", "href"), unlogged=False,
    ):
        con.execute(sql)
    cols = [
        r[0]
        for r in con.execute(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name = 'stg_del2' ORDER BY column_name"
        ).fetchall()
    ]
    assert cols == ["baseurl", "href", "path"]


def test_pg_null_scope_rows_match_themselves_live():
    """An UNSCOPED store (NULL baseurl/path in a large layout) is exactly
    where the reference's plain ``=`` key joins (client.js:1061-1063)
    would silently match nothing — updates become inserts forever and
    tombstones never delete. Our pg dialect strengthens the key equality
    to ``IS NOT DISTINCT FROM``; execute that promise, don't just pin the
    statement text."""
    con = _conn()
    _ins(
        con,
        "resources",
        [
            _row("/a/1", "old", path=None, baseurl=None),
            _row("/a/2", "keep", path=None, baseurl=None),
            _row("/a/3", "doomed", path=None, baseurl=None),
            # a SCOPED row with the same href must be untouched by the
            # null-scope sync's update and delete
            _row("/a/1", "scoped", path="/a", baseurl=BASEURL),
        ],
    )
    _ins(con, "stg_upd", [_row("/a/1", "new", day=2, path=None, baseurl=None)])
    _ins(con, "stg_del", [_row("/a/3", None, path=None, baseurl=None)])
    sqls = generate_delta_sync_sql(
        "resources", "stg_upd", "stg_del", LAYOUT_LARGE, dialect="postgresql"
    )
    con.execute("BEGIN")
    for s in sqls:
        con.execute(s)
    con.execute("COMMIT")
    got = _target(con)
    assert got == {
        ("/a/1", None, None): "new",        # null-scope update matched
        ("/a/2", None, None): "keep",
        ("/a/1", "/a", BASEURL): "scoped",  # other scope untouched
        # /a/3 deleted by the null-scope tombstone semi-join
    }

    # safe-delta set-difference: the NULL-scope predicate ("baseurl IS
    # NOT DISTINCT FROM NULL") must select the null-scope rows — a plain
    # "= NULL" would evaluate UNKNOWN and delete nothing
    con2 = _conn()
    _ins(
        con2,
        "resources",
        [
            _row("/a/1", "member", path=None, baseurl=None),
            _row("/a/2", "no-longer-member", path=None, baseurl=None),
            _row("/a/2", "scoped", path="/a", baseurl=BASEURL),
        ],
    )
    _ins(con2, "stg_upd", [_row("/a/1", "member", path=None, baseurl=None)])
    _ins(con2, "stg_members", [_row("/a/1", None, path=None, baseurl=None)])
    sqls = generate_safe_delta_sql(
        "resources", "stg_upd", "stg_members", LAYOUT_LARGE,
        {"baseurl": None, "path": None}, dialect="postgresql",
    )
    con2.execute("BEGIN")
    for s in sqls:
        con2.execute(s)
    con2.execute("COMMIT")
    got2 = _target(con2)
    assert got2 == {
        ("/a/1", None, None): "member",
        ("/a/2", "/a", BASEURL): "scoped",  # scope re-check spared it
    }


def test_pg_json_target_null_aware_change_detection():
    """The verdict's jsonb execution residue, closed: the null-aware
    change-detecting UPDATE (client.js:1064) runs live against a
    JSON-typed jsondata column with staging inherited from the target
    (like-target DDL) — equal documents touch zero rows, NULL→value,
    value→NULL, and changed documents all update, castless. (Residue
    that remains: pg's jsonb equality is key-order-normalizing; DuckDB's
    JSON compares textually, so these documents use one key order.)"""
    from sri2db_spark.sinks.jdbc import staging_ddl

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE resources (href VARCHAR, key VARCHAR, modified "
        "TIMESTAMP, jsondata JSON, resourcetype VARCHAR, path VARCHAR, "
        "baseurl VARCHAR)"
    )
    for name in ("stg_upd", "stg_del"):
        for sql in staging_ddl(name, "resources", "postgresql", unlogged=False):
            con.execute(sql)
    for name in ("stg_upd", "stg_del"):
        (t,) = con.execute(
            "SELECT data_type FROM information_schema.columns "
            f"WHERE table_name = '{name}' AND column_name = 'jsondata'"
        ).fetchone()
        assert t == "JSON"

    _ins(
        con,
        "resources",
        [
            _row("/a/1", '{"v": 1}'),   # identical in staging -> no touch
            _row("/a/2", '{"v": 2}'),   # changed -> update
            _row("/a/3", None),          # NULL -> value
            _row("/a/4", '{"v": 4}'),   # value -> NULL
        ],
    )
    _ins(
        con,
        "stg_upd",
        [
            _row("/a/1", '{"v": 1}', day=2),
            _row("/a/2", '{"v": 22}', day=2),
            _row("/a/3", '{"v": 3}', day=2),
            _row("/a/4", None, day=2),
        ],
    )
    sqls = generate_delta_sync_sql(
        "resources", "stg_upd", "stg_del", LAYOUT_LARGE, dialect="postgresql"
    )
    update = next(s for s in sqls if s.startswith("UPDATE"))
    n = con.execute(update).fetchone()[0]
    assert n == 3  # /a/1 identical: the null-aware triple skipped it
    got = {
        r[0]: (r[1], str(r[2]))
        for r in con.execute(
            "SELECT href, jsondata, modified FROM resources"
        ).fetchall()
    }
    assert got["/a/1"][1].startswith("2024-01-01")  # untouched
    assert '"v": 22' in (got["/a/2"][0] or "") or '"v":22' in (got["/a/2"][0] or "")
    assert got["/a/3"][0] is not None
    assert got["/a/4"][0] is None
    for h in ("/a/2", "/a/3", "/a/4"):
        assert got[h][1].startswith("2024-01-02"), h
