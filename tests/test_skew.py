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
