"""Stream-stream interval join: correlate two live streams on a key within a
bounded event-time window (the attribution shape: a click joins the
impression it followed within N minutes).

The batch counterpart is the ``range_join_events`` registry query; this is
the Structured Streaming form. Both sides carry watermarks AND the join
condition bounds the event-time distance in both directions — that pair of
constraints is what lets Spark evict buffered state: a left row can be
dropped once the right watermark passes ``left_time + upper``, so state is
O(rows-in-the-interval-window) per key regardless of stream history. Without
the time-range condition the state store grows unboundedly — the classic
stream-join mistake at production scale.

Inner joins emit as matches arrive; outer variants additionally emit the
unmatched row once the opposite watermark proves no match can come.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    upper: str = "10 minutes",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` rows to ``left`` rows with the same ``key`` where
    ``left_time <= right_time <= left_time + upper``.

    Both inputs must be streaming DataFrames. ``how`` may be "inner" or
    "leftOuter" (unmatched left rows emit with NULL right columns after the
    right watermark passes their interval). Column names are prefixed
    ``l_``/``r_`` to keep the output schema collision-free.
    """
    l = left.select(
        [F.col(c).alias(f"l_{c}") for c in left.columns]
    ).withWatermark(f"l_{left_time}", watermark_delay)
    r = right.select(
        [F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withWatermark(f"r_{right_time}", watermark_delay)
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_time}") >= F.col(f"l_{left_time}"))
        & (F.col(f"r_{right_time}") <= F.col(f"l_{left_time}") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)
