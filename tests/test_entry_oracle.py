"""Mini local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.001,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(rows, columns):
    """Column-name-sorted, row-sorted, float-rounded canonical form."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.17g}"  # full precision: we engineered bit-exactness
        return str(v)

    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


QUERY_KEYS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only check (approximate operators)
        assert len(spark_rows) >= 0
        return
    # Driver's value-hash is type-sensitive: DuckDB HUGEINT (int128, e.g. from
    # SUM() OVER) never matches Spark BIGINT even when values are identical.
    # Lint the oracle's output types so that mismatch fails locally too.
    desc = duck.execute(f"DESCRIBE {sql}").fetchall()
    huge = [r[0] for r in desc if "HUGEINT" in str(r[1]).upper()]
    assert not huge, f"{name}: oracle emits HUGEINT column(s) {huge} — CAST to BIGINT"

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ns = normalize(spark_rows, [c.lower() for c in spark_cols])
    nd = normalize(duck_rows, [c.lower() for c in duck_cols])
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
