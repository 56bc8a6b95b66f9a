"""LIVE execution of the MSSQL-dialect merge SQL, transpiled to DuckDB.

The reference e2e-tests its T-SQL path against a dockerized MSSQL
(/root/reference/test/index.mjs:209-245, docker/mssql_initdb/initdb.sql);
this sandbox has no MSSQL server, and until now the mssql dialect was
pinned only as statement TEXT (goldens + structural regexes). T-SQL and
DuckDB differ only in SURFACE syntax for the statements our generator
emits — aliased ``DELETE w FROM … w``, ``UPDATE w SET … FROM … INNER
JOIN``, ``[bracketed]`` identifiers, ``SELECT TOP 0 … INTO`` — while the
semantic content (join/anti-join predicates, null-aware change detection,
ROW_NUMBER dedup, NOT EXISTS) is identical. So we transpile ONLY those
surface forms, mechanically and shape-anchored (any statement the
transpiler does not recognize in full raises — generator drift can never
silently skip execution), and run the entire merge lifecycle live:

- full merge / full delete-all / delta / safe-delta to the same final
  table states the POSTGRESQL dialect produces on identical seeds (the
  cross-dialect equivalence the reference promises by construction,
  client.js:871-1239 vs :929-1009),
- bracketed ``[key]`` handling on a target that really has a ``key``
  column (T-SQL reserved word, client.js:944),
- the (``=`` OR both-NULL) key-equality expansion matching NULL-scope
  rows, which T-SQL needs because it lacks IS NOT DISTINCT FROM,
- ``SELECT TOP 0 * INTO`` like-target staging DDL,
- transaction rollback restoring the pre-merge table (D6 dry-run).

Residue: T-SQL type-system quirks (datetime2 precision, NVARCHAR
collation) are not executable here — statement semantics are.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.sinks.jdbc import (
    generate_delta_sync_sql,
    generate_full_sync_sql,
    generate_safe_delta_sql,
    staging_ddl,
)

BASEURL = "https://db.api"
SCOPE = {"baseurl": BASEURL, "path": "/a"}
COLS = (
    "(href VARCHAR, key VARCHAR, modified TIMESTAMP, jsondata VARCHAR, "
    "resourcetype VARCHAR, path VARCHAR, baseurl VARCHAR)"
)


def tsql_to_duckdb(sql: str) -> str:
    """Transpile ONE generated T-SQL statement to DuckDB.

    Shape-anchored: each rule fullmatches an entire statement form the
    generator emits; anything else raises. The rewrite touches only
    T-SQL surface syntax — every predicate, subquery, and expression is
    carried through verbatim, so what executes is the generator's own
    semantic content.
    """
    s = " ".join(sql.split())
    # [bracket] identifiers -> standard double-quoted identifiers
    s = re.sub(r"\[(\w+)\]", r'"\1"', s)
    m = re.fullmatch(r"IF OBJECT_ID\(N'(\w+)'\) IS NOT NULL DROP TABLE \1", s)
    if m:
        return f"DROP TABLE IF EXISTS {m.group(1)}"
    m = re.fullmatch(r"SELECT TOP 0 (.+?) INTO (\w+) FROM (\w+)", s)
    if m:
        cols, dst, src = m.groups()
        return f"CREATE TABLE {dst} AS SELECT {cols} FROM {src} LIMIT 0"
    m = re.fullmatch(
        r"DELETE (\w+) FROM (\w+) \1 INNER JOIN (\w+) (\w+) ON (.+)", s
    )
    if m:
        w, tbl, src, t, cond = m.groups()
        return f"DELETE FROM {tbl} {w} USING {src} {t} WHERE {cond}"
    m = re.fullmatch(r"DELETE (\w+) FROM (\w+) \1 WHERE (.+)", s)
    if m:
        w, tbl, cond = m.groups()
        return f"DELETE FROM {tbl} {w} WHERE {cond}"
    m = re.fullmatch(
        r"UPDATE (\w+) SET (.+?) FROM (\w+) \1 INNER JOIN (\w+) (\w+) "
        r"ON (.+?)(?: WHERE (.+))?",
        s,
    )
    if m:
        w, set_clause, tbl, src, t, cond, pred = m.groups()
        out = f"UPDATE {tbl} {w} SET {set_clause} FROM {src} {t} WHERE {cond}"
        if pred:
            out += f" AND ({pred})"
        return out
    if s.startswith("INSERT INTO "):
        return s  # standard SQL once identifiers are unbracketed
    raise AssertionError(f"unrecognized T-SQL statement shape: {s[:160]}")


def _conn():
    con = duckdb.connect()
    for t in ("resources", "stg", "stg_upd", "stg_del", "stg_members"):
        con.execute(f'CREATE TABLE {t} {COLS}')
    return con


def _ins(con, table, rows):
    con.executemany(f"INSERT INTO {table} VALUES (?, ?, ?, ?, ?, ?, ?)", rows)


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
            'SELECT href, "key", modified, jsondata, resourcetype, path, '
            "baseurl FROM resources"
        ).fetchall()
    }


def _seed_target(con):
    _ins(
        con,
        "resources",
        [
            _row("/a/1", "same"),
            _row("/a/2", "old"),
            _row("/a/3", None),
            _row("/a/4", "will-null"),
            _row("/a/5", "gone"),
            _row("/a/5", "other-scope", baseurl="https://other.api"),
        ],
    )


STAGING = [
    _row("/a/1", "same"),
    _row("/a/2", "new"),
    _row("/a/3", "filled"),
    _row("/a/4", None),
    _row("/a/6", "stale", day=2),
    _row("/a/6", "latest", day=3),
]


def _run(con, sqls):
    con.execute("BEGIN")
    for s in sqls:
        con.execute(tsql_to_duckdb(s))
    con.execute("COMMIT")


@pytest.mark.parametrize("mode", ["full_merge", "full_delete_all"])
def test_mssql_full_sync_executes_with_reference_semantics(mode):
    con = _conn()
    _seed_target(con)
    _ins(con, "stg", STAGING)
    sqls = generate_full_sync_sql(
        "resources",
        "stg",
        LAYOUT_LARGE,
        SCOPE,
        prefer_updates_over_inserts=(mode == "full_merge"),
        dialect="mssql",
    )
    _run(con, sqls)
    assert _target(con) == {
        ("/a/1", "/a", BASEURL): "same",
        ("/a/2", "/a", BASEURL): "new",
        ("/a/3", "/a", BASEURL): "filled",
        ("/a/4", "/a", BASEURL): None,
        ("/a/6", "/a", BASEURL): "latest",  # ROW_NUMBER dedup kept newest
        # scope re-check: same href, other scope, untouched by this sync
        ("/a/5", "/a", "https://other.api"): "other-scope",
    }


def test_mssql_change_detection_update_skips_identical_rows():
    """The null-aware <> triple (client.js:932 mssql branch) must touch
    zero rows when staging is identical to the target."""
    con = _conn()
    _seed_target(con)
    _ins(con, "stg", [_row("/a/1", "same")])
    sqls = generate_full_sync_sql(
        "resources", "stg", LAYOUT_LARGE, SCOPE, True, "mssql"
    )
    update = next(s for s in sqls if s.startswith("UPDATE"))
    n = con.execute(tsql_to_duckdb(update)).fetchone()[0]
    assert n == 0


def test_mssql_delta_sync_executes_with_reference_semantics():
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
        "resources", "stg_upd", "stg_del", LAYOUT_LARGE, dialect="mssql"
    )
    _run(con, sqls)
    assert _target(con) == {
        ("/a/1", "/a", BASEURL): "same",
        ("/a/2", "/a", BASEURL): "new",
        ("/a/3", "/a", BASEURL): None,
        ("/a/4", "/a", BASEURL): None,
        ("/a/6", "/a", BASEURL): "latest",
        # the INNER JOIN tombstone delete is an exact-key semi-join
        ("/a/5", "/a", "https://other.api"): "other-scope",
    }


def test_mssql_safe_delta_scope_recheck_spares_other_scopes():
    con = _conn()
    _seed_target(con)
    _ins(con, "stg_upd", [_row("/a/2", "new")])
    _ins(
        con,
        "stg_members",
        [_row(h, None) for h in ("/a/1", "/a/2", "/a/3", "/a/4")],
    )
    sqls = generate_safe_delta_sql(
        "resources", "stg_upd", "stg_members", LAYOUT_LARGE, SCOPE,
        dialect="mssql",
    )
    _run(con, sqls)
    got = _target(con)
    assert ("/a/5", "/a", BASEURL) not in got
    assert got[("/a/5", "/a", "https://other.api")] == "other-scope"
    assert got[("/a/2", "/a", BASEURL)] == "new"
    assert got[("/a/1", "/a", BASEURL)] == "same"


def test_mssql_transaction_rollback_restores_pre_merge_state():
    con = _conn()
    _seed_target(con)
    _ins(con, "stg", STAGING)
    before = _target(con)
    sqls = generate_full_sync_sql(
        "resources", "stg", LAYOUT_LARGE, SCOPE, True, "mssql"
    )
    con.execute("BEGIN")
    for s in sqls:
        con.execute(tsql_to_duckdb(s))
    con.execute("ROLLBACK")
    assert _target(con) == before


def test_mssql_staging_ddl_top0_into_inherits_target_schema():
    """SELECT TOP 0 * INTO (client.js:809-816): like-target staging, plus
    the key-only subset used for deletes/membership snapshots."""
    con = duckdb.connect()
    con.execute(f"CREATE TABLE resources {COLS}")
    for sql in staging_ddl("stg", "resources", "mssql"):
        con.execute(tsql_to_duckdb(sql))
    cols = [
        r[0]
        for r in con.execute(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name = 'stg' ORDER BY ordinal_position"
        ).fetchall()
    ]
    assert cols == [
        "href", "key", "modified", "jsondata", "resourcetype", "path",
        "baseurl",
    ]
    # re-running the DDL is idempotent (IF OBJECT_ID ... DROP)
    for sql in staging_ddl("stg", "resources", "mssql"):
        con.execute(tsql_to_duckdb(sql))
    for sql in staging_ddl(
        "stg_del2", "resources", "mssql", columns=("baseurl", "path", "href")
    ):
        con.execute(tsql_to_duckdb(sql))
    cols = [
        r[0]
        for r in con.execute(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name = 'stg_del2' ORDER BY column_name"
        ).fetchall()
    ]
    assert cols == ["baseurl", "href", "path"]


def test_mssql_null_scope_rows_match_themselves_live():
    """T-SQL has no IS NOT DISTINCT FROM, so the mssql dialect expands key
    equality to (= OR both-NULL) (client.js:929-931): execute that
    NULL-scope promise — updates match, tombstones delete, and the scoped
    same-href row survives."""
    con = _conn()
    _ins(
        con,
        "resources",
        [
            _row("/a/1", "old", path=None, baseurl=None),
            _row("/a/2", "keep", path=None, baseurl=None),
            _row("/a/3", "doomed", path=None, baseurl=None),
            _row("/a/1", "scoped", path="/a", baseurl=BASEURL),
        ],
    )
    _ins(con, "stg_upd", [_row("/a/1", "new", day=2, path=None, baseurl=None)])
    _ins(con, "stg_del", [_row("/a/3", None, path=None, baseurl=None)])
    sqls = generate_delta_sync_sql(
        "resources", "stg_upd", "stg_del", LAYOUT_LARGE, dialect="mssql"
    )
    _run(con, sqls)
    assert _target(con) == {
        ("/a/1", None, None): "new",
        ("/a/2", None, None): "keep",
        ("/a/1", "/a", BASEURL): "scoped",
    }


@pytest.mark.parametrize("synctype", ["full", "delta", "safe_delta"])
def test_mssql_final_state_matches_pg_dialect(synctype):
    """Cross-dialect equivalence, executed: identical seeds through the
    mssql statements (transpiled) and the postgresql statements (native
    DuckDB) must land byte-identical final tables — the reference treats
    the two branches as one merge algorithm with two spellings."""
    finals = {}
    for dialect in ("mssql", "postgresql"):
        con = _conn()
        _seed_target(con)
        if synctype == "full":
            _ins(con, "stg", STAGING)
            sqls = generate_full_sync_sql(
                "resources", "stg", LAYOUT_LARGE, SCOPE, True, dialect
            )
        elif synctype == "delta":
            _ins(con, "stg_upd", STAGING)
            _ins(con, "stg_del", [_row("/a/5", None)])
            sqls = generate_delta_sync_sql(
                "resources", "stg_upd", "stg_del", LAYOUT_LARGE,
                dialect=dialect,
            )
        else:
            _ins(con, "stg_upd", [_row("/a/2", "new")])
            _ins(
                con,
                "stg_members",
                [_row(h, None) for h in ("/a/1", "/a/2", "/a/4")],
            )
            sqls = generate_safe_delta_sql(
                "resources", "stg_upd", "stg_members", LAYOUT_LARGE, SCOPE,
                dialect=dialect,
            )
        if dialect == "mssql":
            sqls = [tsql_to_duckdb(s) for s in sqls]
        con.execute("BEGIN")
        for s in sqls:
            con.execute(s)
        con.execute("COMMIT")
        finals[dialect] = sorted(
            con.execute(
                'SELECT href, "key", modified, jsondata, resourcetype, '
                "path, baseurl FROM resources"
            ).fetchall()
        )
    assert finals["mssql"] == finals["postgresql"]


def test_transpiler_rejects_unknown_shapes():
    """Generator drift must fail the suite, not silently skip execution."""
    with pytest.raises(AssertionError, match="unrecognized"):
        tsql_to_duckdb("MERGE INTO resources USING stg ON 1=1")
    with pytest.raises(AssertionError, match="unrecognized"):
        tsql_to_duckdb("TRUNCATE TABLE resources")
