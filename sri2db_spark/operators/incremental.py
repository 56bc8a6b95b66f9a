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
