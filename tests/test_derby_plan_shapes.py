"""EXPLAIN-shape goldens for the one LIVE engine (embedded Derby).

The golden-SQL suite pins the generated statement TEXT for all three
dialects; this suite pins what the live engine actually DOES with the
ANSI statements — the ordered tree of access-path nodes Derby's optimizer
chooses (table/index scans, join strategies, row-count subqueries) for
every statement of the full-sync and delta-sync merge flows, captured via
``SYSCS_UTIL.SYSCS_GET_RUNTIMESTATISTICS``. Volatile fields (timings,
row/page counters, cost estimates) are stripped; what remains is the plan
shape, so an optimizer-visible regression in the generated SQL (a
predicate change that flips an index scan to a full scan, a rewrite that
turns a hash join into a nested-loop over the whole target) fails the
diff even though the statement text may still look plausible.

The reference's real targets (pg/mssql) cannot run in this sandbox;
these goldens + the 18-combination live matrix in test_jdbc_live.py are
the documented statement-plan parity evidence (r6 verdict, item 8).

Regenerate after an intentional SQL-shape change:
    SPARK_GRAFT_REGEN_GOLDENS=1 python -m pytest tests/test_derby_plan_shapes.py
"""

from __future__ import annotations

import datetime as dt
import itertools
import os
import re

import pytest

from sri2db_spark.model.schema import LAYOUT_LARGE
from sri2db_spark.sinks.jdbc import (
    JdbcResourceSink,
    generate_delta_sync_sql,
    generate_full_sync_sql,
)

_dbseq = itertools.count()
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_sql")
BASEURL = "https://db.api"
SCOPE = {"baseurl": BASEURL, "path": "/a", "resourcetype": "_A"}

#: structural lines: the ResultSet node tree (indentation = tree depth)
_NODE = re.compile(r"ResultSet")
#: volatile suffixes Derby appends to node lines that we keep
_STRIP = re.compile(
    r"\s+at (?:read committed|serializable) isolation level.*$"
)


def _plan_shape(stats_text: str) -> list[str]:
    """The ordered access-path node tree, volatile details stripped.
    Depth is preserved as one '.' per original tab, so a join reordering
    or an added nesting level changes the golden."""
    out: list[str] = []
    for line in stats_text.splitlines():
        if not _NODE.search(line):
            continue
        depth = len(line) - len(line.lstrip("\t"))
        node = _STRIP.sub("", line.strip())
        out.append("." * depth + node)
    return out


def _setup(spark):
    url = f"jdbc:derby:memory:plan{next(_dbseq)};create=true"
    sink = JdbcResourceSink(
        spark=spark,
        url=url,
        target_table="tgt",
        layout=LAYOUT_LARGE,
        properties={},
        dialect="ansi",
    )
    conn = sink._connection()
    st = conn.createStatement()
    cols = ", ".join(
        f'"{c}" {t}'
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
    for t in ("tgt", "stg"):
        st.executeUpdate(f"CREATE TABLE {t} ({cols})")
    # the reference REQUIRES a unique (baseurl, path, href) index
    # (README.md:255-259) — plans must show the optimizer using it
    st.executeUpdate(
        'CREATE UNIQUE INDEX tgt_uq ON tgt ("baseurl", "path", "href")'
    )
    ins = (
        'INSERT INTO {t} ("href","key","modified","jsondata",'
        '"resourcetype","path","baseurl") VALUES '
    )
    ts = dt.datetime(2024, 1, 1, 12, 0, 0).strftime("%Y-%m-%d %H:%M:%S")
    for i in range(5):
        st.executeUpdate(
            ins.format(t="tgt")
            + f"('/a/{i}','{i}',TIMESTAMP('{ts}'),'old','_A','/a','{BASEURL}')"
        )
    for i in range(2, 8):  # overlap + new rows, one changed
        st.executeUpdate(
            ins.format(t="stg")
            + f"('/a/{i}','{i}',TIMESTAMP('{ts}'),'new','_A','/a','{BASEURL}')"
        )
    return conn, st


def _capture(st, sql: str) -> list[str]:
    st.execute(sql)
    rs = st.executeQuery("VALUES SYSCS_UTIL.SYSCS_GET_RUNTIMESTATISTICS()")
    rs.next()
    return _plan_shape(rs.getString(1) or "")


@pytest.mark.parametrize("flavor", ["full", "delta"])
def test_derby_merge_plan_shapes(spark, flavor):
    conn, st = _setup(spark)
    try:
        st.execute("CALL SYSCS_UTIL.SYSCS_SET_RUNTIMESTATISTICS(1)")
        if flavor == "full":
            sqls = generate_full_sync_sql(
                "tgt", "stg", LAYOUT_LARGE, scope=SCOPE, dialect="ansi"
            )
        else:
            # tombstone deletes reuse the staging table as the delete set —
            # the statement SHAPE (semi-join delete) is what's pinned
            sqls = generate_delta_sync_sql(
                "tgt", "stg", "stg", LAYOUT_LARGE, dialect="ansi"
            )
        lines: list[str] = []
        for i, sql in enumerate(sqls):
            first = " ".join(sql.split())[:100]
            lines.append(f"== statement {i}: {first}")
            lines.extend(_capture(st, sql))
        got = "\n".join(lines) + "\n"
        path = os.path.join(GOLDEN_DIR, f"plan_shape.{flavor}.ansi.txt")
        if os.environ.get("SPARK_GRAFT_REGEN_GOLDENS"):
            with open(path, "w") as f:
                f.write(got)
        with open(path) as f:
            want = f.read()
        assert got == want, (
            f"Derby plan shape drifted for {flavor} sync — if the SQL "
            "change is intentional, regenerate with "
            "SPARK_GRAFT_REGEN_GOLDENS=1"
        )
    finally:
        conn.close()
