"""Canary: pin the driver-generated testdata schemas this repo's queries and
DuckDB oracles were engineered against.

Between rounds 2 and 3 the driver regenerated ``events.parquet`` with
``ts`` flipped from TIMESTAMP(NANOS)-read-as-int64 to TIMESTAMP(MICROS) —
which surfaced as nine cryptic ``DATATYPE_MISMATCH`` oracle failures. This
test exists so any future drift fails ONE loudly-named test that says exactly
which table/column moved and where the compensation points are:

- Spark side: ``sri2db_spark/plans/analytics.py::_normalize_ts_nanos``
  (canonicalizes time-typed columns to int64 epoch-nanos / timestamp_ntz).
- Oracle side: ``sri2db_spark/plans/oracles.py`` (DuckDB sees the RAW parquet
  schema — oracles must convert with epoch_ns()/epoch_ms() in lockstep).

If this fails, update both sides for the new physical type, then refresh the
pinned snapshot below.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

# table -> {column: pyarrow type string} as generated for rounds 3-4.
# list<item/element> naming differs across generator versions; normalized below.
PINNED = {'customer': {'c_acctbal': 'double',
              'c_custkey': 'int64',
              'c_mktsegment': 'string',
              'c_name': 'string',
              'c_nationkey': 'int32'},
 'documents': {'doc_id': 'int64',
               'lang': 'string',
               'n_chars': 'int64',
               'source': 'string',
               'text': 'string'},
 'embeddings': {'embedding': 'list<float>', 'label': 'int32', 'vec_id': 'int64'},
 'events': {'event_id': 'int64',
            'event_type': 'string',
            'props': 'string',
            'ts': 'timestamp[us]',
            'user_id': 'int64',
            'value': 'double'},
 'lineitem': {'l_discount': 'double',
              'l_extendedprice': 'double',
              'l_linenumber': 'int32',
              'l_linestatus': 'string',
              'l_orderkey': 'int64',
              'l_partkey': 'int64',
              'l_quantity': 'double',
              'l_returnflag': 'string',
              'l_shipdate': 'timestamp[us]',
              'l_suppkey': 'int64',
              'l_tax': 'double'},
 'nation': {'n_name': 'string', 'n_nationkey': 'int32', 'n_regionkey': 'int32'},
 'orders': {'o_custkey': 'int64',
            'o_orderdate': 'timestamp[us]',
            'o_orderkey': 'int64',
            'o_orderpriority': 'string',
            'o_orderstatus': 'string',
            'o_totalprice': 'double'},
 'part': {'p_brand': 'string',
          'p_name': 'string',
          'p_partkey': 'int64',
          'p_retailprice': 'double',
          'p_size': 'int32',
          'p_type': 'string'},
 'region': {'r_name': 'string', 'r_regionkey': 'int32'},
 'supplier': {'s_acctbal': 'double',
              's_name': 'string',
              's_nationkey': 'int32',
              's_suppkey': 'int64'}}

# Physical variants _normalize_ts_nanos/oracles are KNOWN to handle for a
# column; drift into one of these is tolerated (both sides compensate), drift
# anywhere else fails hard.
TOLERATED = {
    ("events", "ts"): {"timestamp[us]", "timestamp[ns]", "int64"},
    ("orders", "o_orderdate"): {"date32[day]", "timestamp[us]"},
    ("lineitem", "l_shipdate"): {"date32[day]", "timestamp[us]"},
}


def _norm(t) -> str:
    s = str(t)
    # pyarrow renders list item naming inconsistently across versions
    return (
        s.replace("list<element: ", "list<")
        .replace("list<item: ", "list<")
        .replace("large_string", "string")
    )


@pytest.mark.parametrize("table", sorted(PINNED))
def test_testdata_schema_pinned(table):
    path = f"{SF_DIR}/{table}.parquet"
    schema = pq.read_schema(path)
    actual = {n: _norm(schema.field(n).type) for n in schema.names}
    exp = PINNED[table]

    missing = sorted(set(exp) - set(actual))
    assert not missing, (
        f"TESTDATA DRIFT: {table} lost columns {missing} — queries in "
        f"plans/analytics.py and oracles in plans/oracles.py reference them."
    )
    for col, exp_t in exp.items():
        act_t = actual[col]
        if act_t == exp_t:
            continue
        tol = TOLERATED.get((table, col), set())
        assert act_t in tol, (
            f"TESTDATA DRIFT: {table}.{col} is now {act_t} (pinned {exp_t}, "
            f"tolerated {sorted(tol) or 'none'}). Update BOTH "
            f"_normalize_ts_nanos (plans/analytics.py) and the DuckDB "
            f"conversion in plans/oracles.py, then re-pin here."
        )
