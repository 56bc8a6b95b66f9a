"""Incremental aggregate maintenance — the rollup-refresh path at 100 TB.

A materialized rollup (keyed sums + counts) is refreshed by aggregating ONLY
the new partition and merging the two keyed aggregates — never by re-scanning
history. Sums and counts are algebraic, so the merge is a second groupBy over
(|keys| x |delta keys|) rows: tiny compared to the fact table, and the only
shuffle touches aggregate rows, not facts.

Determinism: sums are carried as decimal-exact values (cast → sum → cast, see
plans.analytics.dsum), so merge order across partitions cannot change the
result — merged-incremental output is bit-identical to a full recompute.

Reference behavior mirrored: the reference keeps per-sync running counters and
folds each batch into them (/root/reference/src/lib/client.js:1580-1620 keeps
cumulative inserted/updated/deleted counts across paged batches); this operator
is the same fold expressed over keyed aggregate tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_partial_aggs(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
    scale: str = "decimal(18,4)",
) -> DataFrame:
    """Merge two same-shaped keyed aggregates (sums + a count column).

    Both inputs must carry ``keys``, ``sum_cols`` (double, derived from
    decimal-exact partial sums) and ``count_col`` (long). New keys appear,
    existing keys combine; the result equals aggregating the union of the
    underlying facts.
    """
    cols = [*keys, *sum_cols, count_col]
    merged = existing.select(*cols).unionByName(delta.select(*cols))
    aggs = [
        F.sum(F.col(c).cast(scale)).cast("double").alias(c) for c in sum_cols
    ] + [F.sum(count_col).alias(count_col)]
    return merged.groupBy(*keys).agg(*aggs)


def snapshot_diff(
    snap_a: DataFrame,
    snap_b: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key across two table snapshots as added / removed /
    changed / unchanged.

    One null-safe full outer join on ``keys`` (the reference's delta sync
    derives the same three sets — inserts, deletes, updates — per batch,
    /root/reference/src/lib/client.js:1057-1111; this is the snapshot-level
    equivalent a lakehouse needs for incremental publish). ``compare_cols``
    are compared null-safely, so NULL→NULL is unchanged and NULL→value is
    changed. Output keeps the post-image (b) values with the pre-image (a)
    as a fallback for removed rows.
    """
    a = snap_a.select(
        *[F.col(k).alias(f"__a_{k}") for k in keys],
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
        F.lit(True).alias("__a_present"),
    )
    b = snap_b.select(
        *[F.col(k).alias(f"__b_{k}") for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        F.lit(True).alias("__b_present"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__a_{k}").eqNullSafe(F.col(f"__b_{k}"))
        cond = c if cond is None else (cond & c)
    # presence markers, not key-isNotNull: a legitimately-NULL key row would
    # otherwise misclassify (the NULL-scoping-key lesson from the merge ops)
    in_a = F.col("__a_present").isNotNull()
    in_b = F.col("__b_present").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
        same = eq if same is None else (same & eq)
    change_type = (
        F.when(~in_a, F.lit("added"))
        .when(~in_b, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"__b_{k}"), F.col(f"__a_{k}")).alias(k) for k in keys
    ]
    out_cols = [
        F.coalesce(F.col(f"__b_{c}"), F.col(f"__a_{c}")).alias(c)
        for c in compare_cols
    ]
    return a.join(b, cond, "full_outer").select(
        *out_keys, *out_cols, change_type.alias("change_type")
    )
