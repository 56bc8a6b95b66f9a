"""Salting operators: results must equal the unsalted formulations exactly
on skewed data (only the physical distribution may differ)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sri2db_spark.operators.skew import salted_join, salted_top_k


def _skewed(spark):
    # one hot key (0) with 5k rows, 50 normal keys with ~20 each
    hot = spark.range(5000).select(
        F.lit(0).alias("k"), (F.col("id")).alias("payload")
    )
    cold = spark.range(1000).select(
        (F.col("id") % 50 + 1).alias("k"), (F.col("id") + 10_000).alias("payload")
    )
    return hot.unionByName(cold)


def test_salted_inner_join_equals_plain(spark):
    left = _skewed(spark)
    right = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )
    plain = left.join(right, ["k"], "inner").collect()
    salted = salted_join(left, right, ["k"], salt=8, how="inner").collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_salted_left_join_keeps_unmatched(spark):
    left = _skewed(spark)  # keys 0..50; right only has 0..29
    right = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )
    plain = left.join(right, ["k"], "left").collect()
    salted = salted_join(left, right, ["k"], salt=8, how="left").collect()
    assert sorted(map(lambda r: tuple(-1 if v is None else v for v in r), salted)) == sorted(
        map(lambda r: tuple(-1 if v is None else v for v in r), plain)
    )


def test_salted_top_k_equals_single_window(spark):
    df = _skewed(spark)
    order = [F.col("payload").desc(), F.col("k").asc()]
    w = Window.partitionBy("k").orderBy(*order)
    plain = (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    )
    salted = salted_top_k(df, ["k"], order, k=3, salt=8).collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_semantic_dedup_hot_cluster_capped(spark):
    """Adversarial one-cluster corpus (k=1 forces every vector into one
    block): the pair budget must bound the keep-side to the cap's lowest-id
    members, every dup with a low-id partner is still caught, and a normal
    corpus's output is bit-identical with and without the cap."""
    import numpy as np

    from sri2db_spark.functions import dedup as D

    rng = np.random.RandomState(7)
    base = rng.randn(8)
    rows = []
    # 200 vectors: 100 near-identical to `base` (all mutual dups), 100 noise
    for i in range(100):
        rows.append((i, (base + 0.001 * rng.randn(8)).tolist()))
    for i in range(100, 200):
        rows.append((i, rng.randn(8).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = D.semantic_dedup_pairs(
        df, k=1, iters=1, threshold=0.99, max_cluster_size=20
    ).collect()
    # every near-identical vector except the keeper is flagged, anchored to
    # a head member (the 20 lowest ids)
    dups = {r.id_dup for r in capped}
    assert dups == set(range(1, 100))
    assert all(r.id_keep < 20 for r in capped)
    # normal corpus (clusters under the cap): cap on == cap off, bit-exact
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with_cap = sorted(
        map(tuple, D.semantic_dedup_pairs(emb, k=16, max_cluster_size=5000).collect())
    )
    no_cap = sorted(
        map(tuple, D.semantic_dedup_pairs(emb, k=16, max_cluster_size=None).collect())
    )
    assert with_cap == no_cap
