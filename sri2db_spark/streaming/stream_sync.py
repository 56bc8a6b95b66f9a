"""Structured Streaming ingest: resource feed → incremental merge.

The Spark-native evolution of the reference's event-triggered delta sync
(SURVEY §3.5): when the SRI feed lands as files/Kafka instead of a polled
REST API, ``readStream`` + ``foreachBatch`` turns every micro-batch into the
same C1-dedup + C4/C5/C6 merge the batch engine runs, with Spark's
checkpointing replacing the synctimes watermark (offsets are exact, so the
±1% clock-skew compensation isn't needed on this path).

At scale this is the preferred continuous path: Trigger.AvailableNow for
catch-up runs, default micro-batches for tail-following; state stays in the
lake table, not in the stream (merges are idempotent by (key, modified)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model.schema import TableLayout
from ..operators.merge import merge_incremental
from ..operators.normalize import project_to_row, repair_resources
from ..sinks.lake import LakeTable

# File feed schema: one JSON object per line with the SRI envelope fields the
# merge needs. ``deleted`` rows become tombstones (the reference's A5 feed).
FEED_SCHEMA = T.StructType(
    [
        T.StructField("href", T.StringType(), True),
        T.StructField("resource", T.StringType(), True),
        T.StructField("deleted", T.BooleanType(), True),
    ]
)


def stream_sync_from_files(
    spark: SparkSession,
    feed_dir: str,
    table: LakeTable,
    layout: TableLayout,
    baseurl: str | None,
    path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a streaming query merging a JSONL resource feed into the table.

    Returns the StreamingQuery; callers ``awaitTermination()`` it. Each
    micro-batch runs the exact incremental merge used by deltaSync.
    """
    stream = (
        spark.readStream.schema(FEED_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(feed_dir)
    )

    keys = layout.key_columns

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # split updates/tombstones on the feed's deleted flag
        flagged = repair_resources(batch_df).withColumn(
            "__deleted", F.coalesce(F.col("deleted"), F.lit(False))
        )
        upd = project_to_row(
            flagged.filter(~F.col("__deleted")), layout, baseurl, path
        )
        dels = project_to_row(
            flagged.filter(F.col("__deleted")), layout, baseurl, path
        ).select(*keys)
        target = table.read_partition(baseurl, path)
        merged = merge_incremental(target, upd, dels, keys)
        table.replace_partition(merged, baseurl, path)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
