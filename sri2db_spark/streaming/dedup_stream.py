"""Streaming deduplication for continuous ingest pipelines.

Batch dedup (``functions.dedup``) assumes the corpus is at rest; a training
pipeline tailing a document feed needs duplicates dropped AS rows arrive,
with bounded state. Two Spark-native levels:

- ``stream_exact_dedup``: content-hash dedup with
  ``dropDuplicatesWithinWatermark`` — state is bounded by the event-time
  watermark (a duplicate arriving within the delay window is dropped;
  older re-arrivals age out of state instead of growing it forever). This
  is the 100 TB-safe shape: state size tracks the window's arrival rate,
  not corpus history.
- ``stream_exact_dedup_global``: ``dropDuplicates`` on the hash with no
  watermark — exact global dedup whose state grows with distinct corpus
  size. Correct-but-unbounded; offered for finite backfills
  (Trigger.AvailableNow) where the state is known to fit.

Near-dup streaming (MinHash against the accumulated corpus) is deliberately
NOT a stream-stream self-join — that state would be quadratic. The scale
idiom is stream-vs-static: periodically refresh the batch LSH index and
semi-join arriving docs against it in ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str,
    event_time_col: str,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins exact dedup over a streaming DataFrame with
    watermark-bounded state.

    Adds ``content_hash`` (md5 of the text) and drops any row whose hash was
    already seen within the watermark window. State eviction follows the
    event-time watermark on ``event_time_col``.
    """
    return (
        stream.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(event_time_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def stream_exact_dedup_global(stream: DataFrame, text_col: str) -> DataFrame:
    """Exact global streaming dedup (unbounded state — finite feeds only)."""
    return stream.withColumn("content_hash", F.md5(F.col(text_col))).dropDuplicates(
        ["content_hash"]
    )


def stream_neardup_dedup(
    stream: DataFrame,
    index_bands: DataFrame,
    index_shingles: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    trigger_available_now: bool = True,
):
    """Stream-vs-static near-dup dedup: every micro-batch is LSH-filtered
    against a pre-built corpus index (functions.dedup.build_lsh_index) and
    survivors append to ``out_dir`` as parquet.

    This is the scale-safe continuous near-dup shape: state lives in the
    periodically refreshed static index, not in the stream — a
    stream-stream self-join would hold quadratic state. Exactly-once comes
    from checkpointed offsets + append-only parquet.
    """
    from ..functions.dedup import neardup_filter_against_index  # noqa: PLC0415

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        survivors = neardup_filter_against_index(
            batch_df, index_bands, index_shingles, id_col, text_col,
            threshold=threshold,
        )
        survivors.write.mode("append").parquet(out_dir)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
