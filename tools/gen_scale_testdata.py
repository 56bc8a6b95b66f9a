#!/usr/bin/env python
"""Synthesize larger scale factors from the driver's sf0.1 testdata.

Round-9 verdict item 1: everything *measured* so far stops at sf0.1
(~600k lineitem rows); the 100 TB story otherwise rests on plan guards
and probes. This tool manufactures an sfN directory that is a COPIES-fold
scale-up of sf0.1 with value distributions preserved, so `bench.py` can be
pointed at it (SPARK_GRAFT_SF_DIR=<out>) and per-query scaling factors
measured instead of asserted.

Scale-up construction (per copy i in 0..COPIES-1):

* every key column is offset by ``i * stride`` where ``stride`` is
  ``max(key)+1`` of its domain in the source — join fan-out, group
  cardinality ratios, and per-key densities are all preserved exactly
  (copy 0 IS sf0.1 byte-for-value);
* ``region``/``nation`` stay fixed (TPC-H semantics: dimension tables of
  constant size; the foreign keys into them are left unchanged so the
  per-nation densities scale uniformly);
* ``documents.text`` for copies >= 1 is token-tagged (every whitespace
  token gets a ``_i`` suffix): shingle/MinHash/SimHash/span structure
  *within* a copy is preserved exactly while cross-copy n-grams are
  disjoint, so every dedup statistic scales by exactly COPIES instead of
  collapsing into cross-copy duplicate clusters that sf0.1 does not have;
* ``embeddings.embedding`` values are kept as-is (ANN cost is geometric,
  not identity-sensitive; ids are offset so top-k join keys stay unique).

The --skew-out variant is the SAME size but with two planted hot keys
(the shapes AQE's skew handling exists for):

* 20% of documents get a fixed 48-token boilerplate prefix — one shared
  hot shingle set across COPIES*1000s of docs (stresses the gram shuffle
  in dup_spans and the LSH band buckets in dedup_minhash_lsh);
* 30% of events collapse onto user_id=1 (stresses keyed windows).

Outputs Spark-written parquet DIRECTORIES named ``<table>.parquet`` —
exactly what plans/analytics._t loads. Name the output dir ``.../sf<N>``
so bench.py's sf parse works (e.g. /tmp/sgscale/sf1, /tmp/sgskew/sf1).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sri2db_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# key column -> domain name; every column of one domain shifts by the
# same stride so referential integrity survives the copy offset
KEY_DOMAINS = {
    "c_custkey": "customer",
    "o_custkey": "customer",
    "s_suppkey": "supplier",
    "l_suppkey": "supplier",
    "p_partkey": "part",
    "l_partkey": "part",
    "o_orderkey": "orders",
    "l_orderkey": "orders",
    "event_id": "event",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}
DOMAIN_SOURCE = {  # domain -> (table, column) whose max defines the stride
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
FIXED_TABLES = {"region", "nation"}
# output file counts sized so a partition stays well under executor
# memory at 10x (lineitem 10x ~ 110 MB on disk -> 32 files ~ tens of MB
# decompressed each)
N_FILES = {"lineitem": 32, "orders": 16, "events": 16, "documents": 8}

HOT_PREFIX = " ".join(f"boilerplate{i} hot shared banner" for i in range(12))


def _strides(spark, src: str) -> dict[str, int]:
    out = {}
    for dom, (tbl, col) in DOMAIN_SOURCE.items():
        mx = (
            spark.read.parquet(f"{src}/{tbl}.parquet")
            .agg(F.max(col))
            .first()[0]
        )
        out[dom] = int(mx) + 1
    return out


def _scale_table(
    spark, src: str, name: str, copies: int, strides: dict[str, int]
) -> DataFrame:
    df = spark.read.parquet(f"{src}/{name}.parquet")
    if name in FIXED_TABLES or copies == 1:
        return df
    cp = spark.range(copies).select(F.col("id").alias("__copy"))
    out = df.crossJoin(F.broadcast(cp))
    for c, t in df.dtypes:
        dom = KEY_DOMAINS.get(c)
        if dom is not None:
            out = out.withColumn(
                c,
                (F.col(c) + F.col("__copy") * F.lit(strides[dom])).cast(t),
            )
    if name == "documents":
        # token-tag text for copies >= 1: same token count / lengths /
        # within-copy duplicate structure, disjoint cross-copy shingles
        tagged = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda tok: F.concat(tok, F.lit("_"), F.col("__copy")),
            ),
            " ",
        )
        out = out.withColumn(
            "text", F.when(F.col("__copy") == 0, F.col("text")).otherwise(tagged)
        ).withColumn("n_chars", F.length("text").cast("long"))
    return out.drop("__copy")


def _skew_table(name: str, df: DataFrame) -> DataFrame:
    if name == "documents":
        hot = F.col("doc_id") % 5 == 0  # 20% of docs share one hot prefix
        df = df.withColumn(
            "text",
            F.when(hot, F.concat(F.lit(HOT_PREFIX + " "), F.col("text"))).otherwise(
                F.col("text")
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    elif name == "events":
        df = df.withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 < 3, F.lit(1)).otherwise(
                F.col("user_id")
            ).cast("long"),
        )
    return df


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--out", required=True)
    p.add_argument("--skew-out", default=None)
    p.add_argument("--copies", type=int, default=10)
    a = p.parse_args()

    spark = get_spark(app_name="gen_scale_testdata")
    spark.sparkContext.setLogLevel("ERROR")
    strides = _strides(spark, a.src)
    for name in TABLES:
        df = _scale_table(spark, a.src, name, a.copies, strides)
        n = N_FILES.get(name, 4)
        df.repartition(n).write.mode("overwrite").parquet(
            f"{a.out}/{name}.parquet"
        )
        if a.skew_out:
            _skew_table(name, df).repartition(n).write.mode(
                "overwrite"
            ).parquet(f"{a.skew_out}/{name}.parquet")
        print(f"wrote {name}", flush=True)
    # post-write sanity: row counts are exactly copies x source (fixed
    # tables excepted) and keys stay unique where the source's were
    for name in TABLES:
        src_n = spark.read.parquet(f"{a.src}/{name}.parquet").count()
        out_df = spark.read.parquet(f"{a.out}/{name}.parquet")
        out_n = out_df.count()
        want = src_n if name in FIXED_TABLES else src_n * a.copies
        assert out_n == want, (name, out_n, want)
    for tbl, col in (
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("events", "event_id"),
    ):
        d = spark.read.parquet(f"{a.out}/{tbl}.parquet")
        assert d.count() == d.select(col).distinct().count(), (tbl, "dup keys")
    print("OK", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
