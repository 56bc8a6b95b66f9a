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


def test_pagerank_hub_star_matches_closed_form(spark):
    """A 20k-leaf hub (the web-graph celebrity shape): the distributed
    fixed-point PageRank must match the closed-form integer recurrence
    exactly — by symmetry the star has only two distinct rank values, so
    the recurrence is computable in the test."""
    from sri2db_spark.functions.graph import RANK_SCALE, pagerank

    n_leaves = 20_000
    leaves = spark.range(1, n_leaves + 1)
    edges = leaves.select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    ).unionByName(leaves.select(F.col("id").alias("src"), F.lit(0).alias("dst")))
    got = pagerank(edges, iters=3, dedup_edges=False)
    n = n_leaves + 1
    base = RANK_SCALE // n
    tp = (15 * base) // 100
    rc, rl = base, base  # center, leaf
    for _ in range(3):
        rc, rl = (
            tp + (85 * (n_leaves * (rl // 1))) // 100,
            tp + (85 * (rc // n_leaves)) // 100,
        )
    agg = got.groupBy("rank_e12").agg(F.count(F.lit(1)).alias("n")).collect()
    dist = {r["rank_e12"]: r["n"] for r in agg}
    assert dist == {rc: 1, rl: n_leaves}


def test_triangle_counts_hub_node_correct(spark):
    """A 2000-leaf hub with 10 planted leaf-leaf edges: degree orientation
    builds wedges at the (low-degree) leaves, never the hub, and the
    counts are exact: triangle (hub, i, i+1) per planted edge."""
    from sri2db_spark.functions.graph import triangle_counts

    leaves = spark.range(1, 2001)
    spokes = leaves.select(F.lit(0).alias("src"), F.col("id").alias("dst"))
    rims = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 11)], "src long, dst long"
    )
    got = {
        r["node_id"]: r["n_triangles"]
        for r in triangle_counts(spokes.unionByName(rims)).collect()
    }
    assert got[0] == 10
    expected_leaf = {i: (2 if 2 <= i <= 10 else 1) for i in range(1, 12)}
    for i in range(1, 2001):
        assert got[i] == expected_leaf.get(i, 0)
