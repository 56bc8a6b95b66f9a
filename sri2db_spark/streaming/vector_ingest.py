"""Continuous vector ingest into a saved IVF/IVF-PQ index.

A training-data pipeline embeds documents continuously; re-training the ANN
index per batch would be O(corpus) every time. This wrapper assigns each
micro-batch of vectors to the EXISTING coarse centroids (same math as
``similarity.ivf_index_upsert``) and lands them in the index's
cell-partitioned layout, so queries see new vectors immediately and the
per-batch cost is O(batch).

Exactly-once under foreachBatch retries: rows are written with a
``batch_id`` sub-partition under each cell and
``partitionOverwriteMode=dynamic``, so a replayed batch overwrites exactly
its own (cid, batch_id) partitions instead of appending duplicates. Cell
pruning is unaffected — ``cid`` stays the leading partition column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_ivf_ingest(
    stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
):
    """Start a streaming query appending arriving vectors to the saved index
    at ``index_path`` (built by ``build_ivf_index``; centroids are read once
    per batch — nlist·dim doubles)."""
    from ..functions.similarity import _sq_dist  # noqa: PLC0415

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cent_rows = (
            spark.read.parquet(f"{index_path}/centroids").orderBy("cid").collect()
        )
        centroids = [[float(x) for x in r["centroid"]] for r in cent_rows]
        choices = F.array(
            *[
                F.struct(_sq_dist(F.col(vec_col), c).alias("d"), F.lit(i).alias("cid"))
                for i, c in enumerate(centroids)
            ]
        )
        assigned = batch_df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.array_min(choices).getField("cid").alias("cid"),
            F.lit(batch_id).alias("batch_id"),
        )
        (
            assigned.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cid", "batch_id")
            .parquet(f"{index_path}/cells")
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
