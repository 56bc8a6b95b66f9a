"""General as-of join: for every left row, attach the payload of the
nearest-earlier right row (right.time <= left.time) within the same key —
the pandas ``merge_asof`` / kdb ``aj`` / DuckDB ``ASOF JOIN`` operator.

Spark has no native as-of join; the naive formulations both fail at scale:
a range join explodes to O(|L|·|R|) per key, and a per-left-row correlated
lookup is a driver loop. The scale-correct shape is ONE window pass over the
tagged union: right rows sort before left rows at equal timestamps, and a
``last(payload_struct, ignorenulls=True)`` running frame carries the latest
right payload forward onto each left row. One shuffle (the window
partitioning), memory bounded by the window frame, no pair blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join (inclusive: a right row AT the left timestamp
    matches). Returns every left row plus one ``asof_<col>`` column per
    payload column — NULL when no earlier right row exists for the key.

    The payload travels as ONE struct, so a legitimately-NULL payload field
    in the matched right row stays NULL instead of being skipped by the
    ignore-nulls carry.

    ``tiebreak``: a right column ordering concurrent right rows (same key
    and timestamp); the LARGEST tiebreak value wins, making the result
    deterministic when right timestamps collide. Required for exact oracle
    parity whenever right (by, time) is not unique.
    """
    rtypes = dict(right.dtypes)
    struct_t = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in payload_cols) + ">"
    lcols = [c for c in left.columns if c not in by and c != left_time]
    r = right.select(
        *by,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*payload_cols).alias("__p"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in lcols],
    )
    l = left.select(
        *by,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_t).alias("__p"),
        F.lit(None).cast(rtypes[tiebreak] if tiebreak else "int").alias("__tb"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        *by,
        "__t",
        "__side",
        *[F.col(f"__l_{c}") for c in lcols],
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *by,
        F.col("__t").alias(left_time),
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col("__p").getField(c).alias(f"asof_{c}") for c in payload_cols],
    )
