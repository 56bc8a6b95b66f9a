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


def _fs_or_local(fs):
    from ..sinks.fs import LocalFS  # noqa: PLC0415

    return fs or LocalFS()


def _check_no_root_flat(*dirs: str, fs=None) -> None:
    """Refuse to start a batch-id-addressed stream over an output directory
    that still holds flat parquet at its ROOT (the pre-batch-addressed
    append layout): ``spark.read.parquet(dir)`` over such a mix returns
    ONLY the root files and silently drops every ``batch_id=*`` row, so
    new survivors would be invisible to the documented read. Migrate the
    legacy files first (``python -m sri2db_spark output-compact --dir
    <dir>`` folds them into a batch-addressed base), then restart the
    stream. ``fs``: the filesystem the outputs live on (object-store
    deployments pass their binding; default local disk)."""
    fs = _fs_or_local(fs)
    for d in dirs:
        if fs.isdir(d) and any(
            n.endswith(".parquet") for n in fs.listdir(d)
        ):
            raise ValueError(
                f"{d} holds flat parquet at its root (legacy append "
                "layout); mixing it with batch_id=* subdirectories makes "
                "spark.read.parquet silently drop the subdirectory rows. "
                f"Run `python -m sri2db_spark output-compact --dir {d}` "
                "to migrate, then restart the stream."
            )


def stream_neardup_incremental(
    stream: DataFrame,
    store_dir: str,
    corpus_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 128,
    bands: int = 64,
    threshold: float = 0.5,
    trigger_available_now: bool = True,
    fs=None,
):
    """Self-maintaining streaming near-dup: every micro-batch is near-dup
    checked against the signature store of ALL earlier batches via
    ``functions.dedup.incremental_neardup_pairs``, then its own signatures
    join the store — no periodic index rebuild, the index IS the stream
    history. Per-batch cost is O(batch): signatures for the batch only, one
    band join against the store, exact verification against only the docs
    the candidates mention.

    Exactly-once under foreachBatch retries: every sink write is addressed
    by batch id (``.../batch_id=N`` subdirectories written with overwrite),
    so a replayed batch overwrites its own partial output instead of
    duplicating it — and the store read EXCLUDES the current batch id, so a
    retry never sees its own half-written signatures as "old".

    Outputs:
    - ``store_dir``: (id, sig) signatures, partitioned by batch_id.
    - ``corpus_dir``: raw (id, text) per batch — the verification lookup.
    - ``pairs_dir``: (id_a, id_b, jaccard) near-dup pairs, partitioned by
      batch_id (pairs discovered when the later member arrived).

    ``fs``: the filesystem the three directories live on — the layout
    guard and Spark path qualification route through it (default local).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from ..functions import dedup as D  # noqa: PLC0415

    fs = _fs_or_local(fs)
    _check_no_root_flat(store_dir, corpus_dir, pairs_dir, fs=fs)

    def _read_excluding(spark, base: str, batch_id: int, cols: list[str]):
        from pyspark.errors import AnalysisException  # noqa: PLC0415

        sbase = fs.spark_path(base)
        try:
            df = spark.read.option("basePath", sbase).parquet(sbase)
        except AnalysisException:  # first batch: nothing yet (path-missing
            # only — transient I/O errors propagate, see statestore)
            return None
        if "batch_id" not in df.columns:
            return df.select(*cols)
        return df.filter(F.col("batch_id") != batch_id).select(*cols)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_docs = batch_df.select(
            F.col(id_col), F.col(text_col)
        ).persist()
        sigs = D.oph_signatures(batch_docs, id_col, text_col, k, num_perm).persist()
        old_sigs = _read_excluding(spark, store_dir, batch_id, ["id", "sig"])
        old_corpus = _read_excluding(spark, corpus_dir, batch_id, [id_col, text_col])
        lookup = (
            old_corpus.unionByName(batch_docs)
            if old_corpus is not None
            else batch_docs
        )
        pairs = D.incremental_neardup_pairs(
            spark, store_dir, batch_docs, lookup, id_col, text_col,
            k=k, num_perm=num_perm, bands=bands, threshold=threshold,
            update_store=False, new_sigs=sigs, old_sigs=old_sigs,
        )
        pairs.write.mode("overwrite").parquet(
            fs.spark_path(f"{pairs_dir}/batch_id={batch_id}")
        )
        batch_docs.write.mode("overwrite").parquet(
            fs.spark_path(f"{corpus_dir}/batch_id={batch_id}")
        )
        sigs.write.mode("overwrite").parquet(
            fs.spark_path(f"{store_dir}/batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_curate_incremental(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    min_quality: float = 0.24,
    neardup_threshold: float = 0.5,
    trigger_available_now: bool = True,
    fs=None,
):
    """Continuous corpus curation: every micro-batch runs the full
    batch-vs-state curation chain (``functions.pipeline.
    curate_batch_incremental`` — quality → exact-vs-state → in-batch dedup →
    decontamination → near-dup-vs-state) and survivors both land in
    ``out_dir`` and join the state for later batches. The curated corpus is
    simply the union of the per-batch outputs.

    Exactly-once under foreachBatch retries: BOTH the curated output and
    every state store write are batch-id-addressed (overwrite on replay),
    and all state reads exclude the current batch id — so a batch that
    crashed after its state append cannot, on replay, anti-join its
    documents against their own first-attempt hashes and silently drop
    them (see ``functions.statestore`` for the protocol).
    """
    from ..functions.pipeline import curate_batch_incremental  # noqa: PLC0415

    fs = _fs_or_local(fs)
    _check_no_root_flat(out_dir, fs=fs)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = curate_batch_incremental(
            spark, batch_df, state_dir, benchmark, id_col, text_col,
            strata_col=strata_col, min_quality=min_quality,
            neardup_threshold=neardup_threshold, update_state=True,
            batch_token=batch_id,
        )
        out.write.mode("overwrite").parquet(
            fs.spark_path(f"{out_dir}/batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
    fs=None,
):
    """Stream-vs-static near-dup dedup: every micro-batch is LSH-filtered
    against a pre-built corpus index (functions.dedup.build_lsh_index) and
    survivors append to ``out_dir`` as parquet.

    This is the scale-safe continuous near-dup shape: state lives in the
    periodically refreshed static index, not in the stream — a
    stream-stream self-join would hold quadratic state. Exactly-once under
    foreachBatch retries: survivors are written to
    ``out_dir/batch_id=<id>`` with overwrite (same discipline as the two
    incremental wrappers above), so a replayed batch replaces its own
    partial output instead of double-appending it. Read the output with
    ``spark.read.parquet(out_dir)`` — ``batch_id`` surfaces as a partition
    column. An ``out_dir`` still holding the PRE-batch-addressed flat
    layout is rejected at start (see :func:`_check_no_root_flat`) — run
    ``output-compact`` on it first.
    """
    from ..functions.dedup import neardup_filter_against_index  # noqa: PLC0415

    fs = _fs_or_local(fs)
    _check_no_root_flat(out_dir, fs=fs)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        survivors = neardup_filter_against_index(
            batch_df, index_bands, index_shingles, id_col, text_col,
            threshold=threshold,
        )
        survivors.write.mode("overwrite").parquet(
            fs.spark_path(f"{out_dir}/batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
