"""Event-time windowed aggregation for continuous ingest metrics.

The streaming counterpart of the batch ``events_hourly`` registry query: a
tumbling event-time window with a watermark, so (a) state is bounded — closed
windows are evicted, (b) output is deterministic under replay — a window
finalizes exactly once when the watermark passes its end, and (c) late rows
beyond the delay are dropped instead of mutating already-emitted results.

At 100 TB-scale ingest this is the shape that keeps per-executor state at
O(windows-in-flight x keys), independent of stream history. Append output
mode makes the sink idempotent (each window row is written exactly once),
which is what a downstream lake partition needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    event_time_col: str,
    key_col: str | None = None,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts with watermark-bounded state.

    Returns (window_start, window_end[, key], n). With append output mode a
    window's row emits exactly once, after the watermark passes its end;
    rows later than ``watermark_delay`` are dropped.
    """
    wm = stream.withWatermark(event_time_col, watermark_delay)
    keys = [F.window(F.col(event_time_col), window_duration).alias("win")]
    if key_col is not None:
        keys.append(F.col(key_col))
    out = wm.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    cols = [
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
    ]
    if key_col is not None:
        cols.append(F.col(key_col))
    return out.select(*cols, "n")
