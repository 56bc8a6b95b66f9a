"""Golden-file conformance for the dialect merge-SQL generators.

Only Derby executes live in this sandbox (tests/test_jdbc_live.py), so the
pg/mssql statement SHAPES are pinned here instead: every dialect × merge
flavor is byte-diffed against a golden file, and the reference's exact
predicate shapes are asserted structurally:

- the null-aware change predicate ``(a <> b OR (a IS NULL AND b IS NOT
  NULL) OR ...)`` of client.js:1064 (pg) / :932 (mssql) — emitted
  verbatim in shape, never IS DISTINCT FROM;
- the safe-delta set-difference delete re-checks the sync scope inside the
  DELETE (the client.js:1138 comment: "otherwise we would delete
  everything, also from other api's");
- the NOT-IN (pg, client.js:1186) vs NOT-EXISTS (mssql, client.js:1125)
  split is deliberately normalized to NOT EXISTS — see
  generate_safe_delta_sql's docstring for the NULL-tuple hazard;
- the insert path is the reference's ROW_NUMBER dedup + NOT-EXISTS guard
  (client.js:1084-1111);
- the delta tombstone delete keeps each dialect's native join form:
  ``DELETE w FROM … INNER JOIN`` (mssql, client.js:902-918) vs
  ``DELETE … USING`` (pg, client.js:1040-1048).

Regenerate after an intentional change with:
    SPARK_GRAFT_REGEN_GOLDENS=1 python -m pytest tests/test_golden_sql.py
then review the diff like any code change.
"""

from __future__ import annotations

import os

import pytest

from sri2db_spark.model.schema import LAYOUT_LARGE, LAYOUT_MEDIUM, LAYOUT_SMALL
from sri2db_spark.sinks.jdbc import (
    generate_delta_sync_sql,
    generate_full_sync_sql,
    generate_safe_delta_sql,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_sql")
DIALECTS = ("postgresql", "mssql", "ansi")
LAYOUTS = {"large": LAYOUT_LARGE, "medium": LAYOUT_MEDIUM, "small": LAYOUT_SMALL}
SCOPE = {"baseurl": "https://api.example.org", "path": "/things"}

NULL_AWARE = (
    "(w.jsondata <> t.jsondata OR (w.jsondata IS NULL AND t.jsondata IS NOT NULL)"
    " OR (w.jsondata IS NOT NULL AND t.jsondata IS NULL))"
)


def _scope_for(layout) -> dict:
    scope = {}
    if layout.has_baseurl:
        scope["baseurl"] = SCOPE["baseurl"]
    if layout.has_path:
        scope["path"] = SCOPE["path"]
    return scope


def _generate(dialect: str, flavor: str, layout) -> list[str]:
    scope = _scope_for(layout)
    if flavor == "full_delete_all":
        return generate_full_sync_sql(
            "resources", "stg", layout, scope,
            prefer_updates_over_inserts=False, dialect=dialect,
        )
    if flavor == "full_merge":
        return generate_full_sync_sql(
            "resources", "stg", layout, scope,
            prefer_updates_over_inserts=True, dialect=dialect,
        )
    if flavor == "delta":
        return generate_delta_sync_sql(
            "resources", "stg_upd", "stg_del", layout, dialect=dialect
        )
    if flavor == "safe_delta":
        return generate_safe_delta_sql(
            "resources", "stg_upd", "stg_members", layout, scope, dialect=dialect
        )
    raise AssertionError(flavor)


FLAVORS = ("full_delete_all", "full_merge", "delta", "safe_delta")


@pytest.mark.parametrize("dialect", DIALECTS)
@pytest.mark.parametrize("flavor", FLAVORS)
@pytest.mark.parametrize("layout_name", sorted(LAYOUTS))
def test_golden_sql(dialect, flavor, layout_name):
    stmts = _generate(dialect, flavor, LAYOUTS[layout_name])
    content = ";\n\n".join(stmts) + ";\n"
    path = os.path.join(GOLDEN_DIR, f"{flavor}.{layout_name}.{dialect}.sql")
    if os.environ.get("SPARK_GRAFT_REGEN_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(content)
    with open(path) as f:
        golden = f.read()
    assert content == golden, (
        f"{os.path.basename(path)} drifted — if intentional, regenerate "
        "with SPARK_GRAFT_REGEN_GOLDENS=1 and review the diff"
    )


@pytest.mark.parametrize("dialect", ("postgresql", "mssql"))
def test_null_aware_update_predicate_matches_reference(dialect):
    """client.js:1064 (pg) / :932 (mssql): the exact explicit null-aware
    form, not IS DISTINCT FROM."""
    for flavor in ("full_merge", "delta", "safe_delta"):
        stmts = _generate(dialect, flavor, LAYOUT_LARGE)
        update = next(s for s in stmts if s.startswith("UPDATE"))
        assert NULL_AWARE in update
        assert "IS DISTINCT FROM t.jsondata" not in update


@pytest.mark.parametrize("dialect", DIALECTS)
def test_safe_delta_delete_rechecks_scope_and_uses_not_exists(dialect):
    """client.js:1138's scope re-check (never delete other APIs' rows) and
    the deliberate NOT-EXISTS normalization of the :1186 NOT-IN branch."""
    stmts = _generate(dialect, "safe_delta", LAYOUT_LARGE)
    delete = next(s for s in stmts if s.startswith("DELETE"))
    assert "NOT EXISTS" in delete
    assert "NOT IN" not in delete
    assert "baseurl" in delete and "path" in delete
    assert "https://api.example.org" in delete


def test_mssql_statements_parse_on_pre2022_sql_server():
    """The reference's real SQL Server targets predate 2022, and its own
    mssql SQL never uses IS [NOT] DISTINCT FROM, bare boolean literals, or
    a bare-aliased DELETE (client.js:902,929,1130 use ``=`` joins and
    ``DELETE w FROM … w``). Pin that every mssql statement stays inside
    that portable surface: null-aware key equality is the ``(= OR
    both-NULL)`` expansion, scope literals use ``=``/``IS NULL``, and
    plain deletes open with ``DELETE w FROM``. ``key`` is a T-SQL
    reserved word — the reference brackets it (client.js:944/:1157), so a
    bare ``key`` anywhere in a column list is a parse error on a real
    server."""
    import re

    for flavor in ("full_merge", "full_delete_all", "delta", "safe_delta"):
        for layout_name, layout in LAYOUTS.items():
            for s in _generate("mssql", flavor, layout):
                assert "DISTINCT FROM" not in s, (flavor, layout_name, s)
                assert "WHERE TRUE" not in s, (flavor, layout_name, s)
                if s.startswith("DELETE") and "INNER JOIN" not in s:
                    assert s.startswith("DELETE w FROM "), (flavor, layout_name, s)
                assert not re.search(r"(?<!\[)\bkey\b(?!\])", s), (
                    flavor, layout_name, s,
                )


def test_staging_ddl_inherits_target_schema_per_dialect():
    """client.js:809-816 (mssql SELECT TOP 0 … INTO) / :839-843 (pg
    CREATE … AS SELECT * LIMIT 0): staging is created from the target's
    own schema so jsonb/timestamptz columns inherit without casts. The
    pg table is UNLOGGED (regular-table deviation documented in
    staging_ddl: Spark appends over many connections, session-temp tables
    can't work); ansi uses the standard WITH NO DATA form Derby executes
    (proven live in test_jdbc_live.py::test_stage_like_target_live)."""
    from sri2db_spark.sinks.jdbc import staging_ddl

    pg = staging_ddl("stg", "resources", "postgresql")
    assert pg == [
        "DROP TABLE IF EXISTS stg",
        "CREATE UNLOGGED TABLE stg AS SELECT * FROM resources LIMIT 0",
    ]
    ms = staging_ddl("stg", "resources", "mssql")
    assert ms == [
        "IF OBJECT_ID(N'stg') IS NOT NULL DROP TABLE stg",
        "SELECT TOP 0 * INTO stg FROM resources",
    ]
    ansi = staging_ddl("stg", "resources", "ansi", columns=("href", "key"))
    assert ansi == ['CREATE TABLE stg AS SELECT "href", "key" FROM resources WITH NO DATA']


def test_delta_tombstone_delete_keeps_native_join_form():
    """mssql: DELETE w FROM … INNER JOIN (client.js:902); pg: DELETE …
    USING (client.js:1040)."""
    pg = _generate("postgresql", "delta", LAYOUT_LARGE)[0]
    ms = _generate("mssql", "delta", LAYOUT_LARGE)[0]
    assert pg.startswith("DELETE FROM resources w USING stg_del t")
    assert ms.startswith("DELETE w FROM resources w INNER JOIN stg_del t")


@pytest.mark.parametrize("dialect", ("postgresql", "mssql"))
def test_insert_path_is_rownumber_dedup_plus_not_exists(dialect):
    """client.js:1084-1111: newest-per-key ROW_NUMBER dedup wrapped in a
    NOT-EXISTS-guarded insert."""
    stmts = _generate(dialect, "delta", LAYOUT_LARGE)
    insert = next(s for s in stmts if s.startswith("INSERT"))
    assert "ROW_NUMBER() OVER" in insert
    assert "ORDER BY modified DESC" in insert
    assert "WHERE NOT EXISTS" in insert
    # full sync in delete-all mode skips the existence guard, exactly as
    # the reference logs "insert query won't check if row already exists"
    blind = _generate(dialect, "full_delete_all", LAYOUT_LARGE)
    blind_insert = next(s for s in blind if s.startswith("INSERT"))
    assert "NOT EXISTS" not in blind_insert
