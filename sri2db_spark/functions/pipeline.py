"""End-to-end corpus curation: the composed training-data pipeline.

The individual operators (quality scoring, dedup, decontamination,
sampling) each have a registry query; this module wires them into the
standard curation chain a 100 TB pretraining pipeline runs:

    quality filter → exact dedup → benchmark decontamination
                   → stratified sampling → token accounting

Composition is deliberately pure-DataFrame: the whole chain stays one
lazy plan, so Catalyst pushes the quality filter into the scan, reuses
the corpus scan across stages where possible, and the only shuffles are
the two the semantics require (the dedup hash-agg and the
decontamination probe-side aggregation). Every stage is deterministic,
so the full pipeline output is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import (
    ngram_overlap_contamination,
    quality_score,
    stratified_sample,
    token_count_ws,
)


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    min_quality: float = 0.24,
    contamination_k: int = 5,
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 50,
) -> DataFrame:
    """The curated corpus: (id, strata, n_tokens, quality) for every
    surviving document.

    Stages (each drops rows, none reorders — set semantics throughout):

    1. **Quality filter** — ``quality_score ≥ min_quality``; a codegen
       predicate evaluated in the scan stage.
    2. **Exact dedup, first-id-wins** — one hash-aggregation on
       ``md5(text)`` keeps the minimum id per distinct content; survivors
       re-selected with a semi-join on id (build side = one row per
       distinct content, the small side after dedup).
    3. **Benchmark decontamination** — any doc sharing ≥1 k-word shingle
       with the benchmark set is dropped (broadcast shingle probe,
       :func:`ngram_overlap_contamination`).
    4. **Stratified sampling** — per-stratum deterministic ``id %% 100``
       rates (the data-mixing knob).
    5. **Token accounting** — whitespace token counts for downstream
       packing/budgeting.
    """
    scored = docs.withColumn("quality", quality_score(F.col(text_col))).filter(
        F.col("quality") >= min_quality
    )
    reps = scored.groupBy(F.md5(F.col(text_col)).alias("__h")).agg(
        F.min(id_col).alias(id_col)
    ).select(id_col)
    deduped = scored.join(reps, id_col, "left_semi")
    contaminated = ngram_overlap_contamination(
        deduped, benchmark, id_col, text_col, k=contamination_k
    ).select(id_col)
    clean = deduped.join(contaminated, id_col, "left_anti")
    sampled = stratified_sample(
        clean, id_col, strata_col, rates_pct or {}, default_pct=default_pct
    )
    return sampled.select(
        id_col,
        strata_col,
        token_count_ws(F.col(text_col)).alias("n_tokens"),
        "quality",
    )


def init_curation_state(
    docs: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    committer=None,
) -> None:
    """Bootstrap the persisted curation state from an already-ingested
    corpus: content hashes (exact-dup membership), OPH MinHash signatures
    (near-dup membership), and the (id, text) corpus used to exact-verify
    near-dup candidates. Each piece is per-doc-row sized — the state scales
    with corpus cardinality, not corpus bytes (text is the exception, kept
    for verification; a deployment can point verification at the main table
    instead).

    With a versioned ``committer`` (object-store deployments), each store's
    bootstrap is written into a staged version directory and published with
    one atomic pointer commit; subsequent batches append ``batch_id=*``
    subdirectories alongside it and reads resolve base ∪ appends (see
    :mod:`.statestore`)."""
    from .dedup import oph_signatures  # noqa: PLC0415

    pieces = (
        ("hashes", docs.select(F.md5(F.col(text_col)).alias("h")).distinct()),
        ("sigs", oph_signatures(docs, id_col, text_col)),
        (
            "corpus",
            docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")),
        ),
    )
    for sub, df in pieces:
        path = f"{state_dir}/{sub}"
        if committer is not None and committer.versioned:
            tmp = committer.stage(path)
            df.write.mode("overwrite").parquet(tmp)
            committer.commit(tmp, path)
        else:
            df.write.mode("overwrite").parquet(path)


def curate_batch_incremental(
    spark,
    batch: DataFrame,
    state_dir: str,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    min_quality: float = 0.24,
    contamination_k: int = 5,
    neardup_threshold: float = 0.5,
    update_state: bool = True,
    batch_token=None,
    committer=None,
) -> DataFrame:
    """One ingest batch through the curation chain AGAINST persisted state —
    the per-batch cost is O(batch), never O(corpus):

    1. quality filter (codegen predicate, evaluated in the batch scan);
    2. exact dedup vs state — anti-join the batch's content hashes against
       the hash store (broadcast when the batch is small);
    3. first-id-wins exact dedup within the batch;
    4. benchmark decontamination (broadcast shingle probe);
    5. near-dup drop: a batch doc is dropped iff it has shingle-Jaccard ≥
       threshold with ANY smaller-id document in state ∪ batch — computed by
       :func:`..dedup.incremental_neardup_pairs`, so only the batch is
       signatured and only candidate docs are re-shingled.

    Survivors (and only survivors) then join the state so the next batch
    sees them. Returns (id, strata, n_tokens, quality) for batch survivors.

    ``batch_token`` (REQUIRED for any caller that may retry a batch, e.g.
    ``foreachBatch``): state writes become idempotent — each store append is
    addressed to ``<store>/batch_id=<token>`` with overwrite, and every
    state READ excludes that token's files. Without this, a batch that
    crashed after its state append and is replayed would anti-join against
    its own first-attempt hashes and drop all its documents — they would
    sit in state but never reach the curated output (see
    :mod:`.statestore`). Without a token, writes are plain appends
    (single-attempt batch callers only).
    """
    from .dedup import incremental_neardup_pairs, oph_signatures  # noqa: PLC0415
    from .statestore import read_store, write_store_batch  # noqa: PLC0415

    scored = batch.withColumn("quality", quality_score(F.col(text_col)))
    q = scored.filter(F.col("quality") >= min_quality)
    old_hashes = read_store(spark, f"{state_dir}/hashes", exclude_token=batch_token)
    if old_hashes is not None:
        q = q.join(
            F.broadcast(old_hashes),
            F.md5(F.col(text_col)) == F.col("h"),
            "left_anti",
        )
    reps = (
        q.groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    q = q.join(reps, id_col, "left_semi")
    contaminated = ngram_overlap_contamination(
        q, benchmark, id_col, text_col, k=contamination_k
    ).select(id_col)
    q = q.join(contaminated, id_col, "left_anti")
    # near-dup pass runs over the WHOLE batch (pre-filter), so the drop rule
    # is independent of filter order: drop iff a smaller-id partner exists
    # anywhere in state ∪ batch.
    old_corpus = read_store(spark, f"{state_dir}/corpus", exclude_token=batch_token)
    batch_docs = batch.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    lookup = (
        old_corpus.unionByName(batch_docs) if old_corpus is not None else batch_docs
    )
    sigs_all = oph_signatures(batch, id_col, text_col).persist()
    pairs = incremental_neardup_pairs(
        spark, f"{state_dir}/sigs", batch, lookup, "id", "text",
        threshold=neardup_threshold, update_store=False, new_sigs=sigs_all,
        batch_token=batch_token,
    )
    drops = pairs.select(F.col("id_b").alias("__drop")).distinct()
    q = q.join(drops, F.col(id_col) == F.col("__drop"), "left_anti")
    out = q.select(
        F.col(id_col),
        F.col(strata_col),
        token_count_ws(F.col(text_col)).alias("n_tokens"),
        "quality",
    )
    if update_state:
        out = out.persist()
        out.count()  # materialize before state writes consume the plan
        surv = out.select(F.col(id_col).alias("__sid"))
        new_hashes = (
            batch.join(surv, F.col(id_col) == F.col("__sid"), "left_semi")
            .select(F.md5(F.col(text_col)).alias("h"))
            .distinct()
        )
        new_sigs = sigs_all.join(surv, F.col("id") == F.col("__sid"), "left_semi")
        new_corpus = batch_docs.join(
            surv, F.col("id") == F.col("__sid"), "left_semi"
        )
        if batch_token is not None:
            write_store_batch(new_hashes, f"{state_dir}/hashes", batch_token)
            write_store_batch(new_sigs, f"{state_dir}/sigs", batch_token)
            write_store_batch(new_corpus, f"{state_dir}/corpus", batch_token)
        else:
            new_hashes.write.mode(
                "append" if old_hashes is not None else "overwrite"
            ).parquet(f"{state_dir}/hashes")
            new_sigs.write.mode("append").parquet(f"{state_dir}/sigs")
            new_corpus.write.mode("append").parquet(f"{state_dir}/corpus")
    return out


def _swap_dir(src_tmp: str, dst: str) -> None:
    """Directory replace via two renames (dst→old, tmp→dst), same protocol
    as the lake sink's partition swap. NOT atomic to concurrent readers:
    between the two renames ``dst`` does not exist, so compaction and
    retraction must not run concurrently with ingest or queries over the
    same store — quiesce the stream first (the maintenance-window
    discipline every compacting store requires). A reader-safe deployment
    swaps via a versioned directory + manifest pointer instead:
    :class:`...sinks.committer.ManifestCommitter` implements that protocol
    and is what the lake sink uses on object stores."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    old = f"{dst}__old_{uuid.uuid4().hex}"
    if os.path.exists(dst):
        os.rename(dst, old)
        os.rename(src_tmp, dst)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(src_tmp, dst)


def compact_curation_state(spark, state_dir: str) -> dict[str, tuple[int, int]]:
    """Compact the append-only curation state: every ingest batch appends a
    file-set to each store, so after thousands of batches each store is
    thousands of small files and every batch's state read pays the per-file
    open cost. Compaction rewrites each store as one coalesced file-set and
    drops the duplicate rows a crashed-and-replayed batch may have appended
    (stores are membership sets — hashes dedup on h, sigs/corpus on id).
    Swap per store (see :func:`_swap_dir` for the concurrency contract);
    returns {store: (files_before, files_after)}. Handles both flat stores
    and the batch-id-addressed layout streaming ingest writes (compaction
    collapses ``batch_id=*`` subdirectories back into one flat file-set;
    subsequent batches add fresh subdirectories alongside it).

    The NEWEST ``batch_id=*`` subdirectory per store is preserved as-is,
    never folded: a stream batch that crashed after its state write but
    before its checkpoint commit will be REPLAYED with the same token, and
    its replay-safety depends on the current-token path exclusion in
    :func:`~.statestore.read_store` — rows folded into flat files would
    escape that exclusion and the replay would anti-join its own documents
    out of the output. Only committed history (everything older) is
    compacted; the last batch is folded by the next compaction once a
    newer batch exists.
    """
    import os  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    from .statestore import list_store_files  # noqa: PLC0415

    def _count_files(path: str) -> int:
        return sum(
            1
            for _, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    report: dict[str, tuple[int, int]] = {}
    for sub, keys in (("hashes", ["h"]), ("sigs", ["id"]), ("corpus", ["id"])):
        path = f"{state_dir}/{sub}"
        if not os.path.isdir(path):
            continue
        batch_dirs = [
            e
            for e in os.scandir(path)
            if e.is_dir() and e.name.startswith("batch_id=")
        ]

        def _order(e):
            # newest = highest TOKEN when tokens are numeric (streaming
            # batch ids are) — mtime is only the fallback for opaque
            # tokens, because a cp/tar-restored store can have equal or
            # inverted mtimes and preserving the WRONG dir would fold the
            # replayable batch flat
            token = e.name.split("=", 1)[1]
            try:
                return (1, int(token), "")
            except ValueError:
                return (0, os.path.getmtime(e.path), token)

        preserve = max(batch_dirs, key=_order).name if batch_dirs else None
        files = list_store_files(spark, path)
        if preserve is not None:
            files = [f for f in files if f"/{preserve}/" not in f]
        if not files:
            continue
        n_before = len(files) + (
            _count_files(os.path.join(path, preserve)) if preserve else 0
        )
        df = spark.read.parquet(*files).dropDuplicates(keys)
        n_out = max(1, df.rdd.getNumPartitions() // 8)
        tmp = f"{path}__tmp_{uuid.uuid4().hex}"
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
        if preserve is not None:
            # COPY (not rename) the protected batch into the new layout:
            # the original stays in place until the swap, so a crash
            # anywhere before _swap_dir leaves the live store fully
            # intact (tmp is orphan garbage, never a silent subset loss).
            # Cost is one batch's files — O(batch), not O(store).
            import shutil  # noqa: PLC0415

            shutil.copytree(
                os.path.join(path, preserve), os.path.join(tmp, preserve)
            )
        _swap_dir(tmp, path)
        report[sub] = (n_before, _count_files(path))
    return report


def retract_from_state(spark, state_dir: str, ids: list) -> None:
    """Remove documents from every derived curation store — the
    right-to-be-forgotten path for a training-data pipeline: a deletion in
    the source corpus must propagate to the hash store, the signature store,
    and the verification corpus, or the deleted text keeps influencing
    future dedup decisions.

    Signatures and corpus rows are dropped by id (anti-join rewrite); the
    hash store is REBUILT from the remaining corpus because content hashes
    are shared — if a surviving doc carries the same text, its hash must
    stay. Full rewrite per call: at 100 TB the stores would be partitioned
    (e.g. by id range) so a retraction rewrites only the touched partitions;
    the swap protocol (and its no-concurrent-ingest contract, see
    :func:`_swap_dir`) is the same either way.
    """
    import uuid  # noqa: PLC0415

    from pyspark.sql.types import StructType  # noqa: PLC0415

    from .statestore import read_store  # noqa: PLC0415

    corpus_all = read_store(spark, f"{state_dir}/corpus")
    if corpus_all is None:
        return
    # Schema of the id list follows the store's id column (bigint ids and
    # string ids both occur; a hardcoded type would silently anti-join
    # nothing on the other kind).
    id_field = corpus_all.schema["id"]
    ids_df = spark.createDataFrame(
        [(i,) for i in ids], StructType([id_field])
    )
    corpus = corpus_all.join(F.broadcast(ids_df), "id", "left_anti")
    tmp_c = f"{state_dir}/corpus__tmp_{uuid.uuid4().hex}"
    corpus.write.mode("overwrite").parquet(tmp_c)
    _swap_dir(tmp_c, f"{state_dir}/corpus")
    sigs_all = read_store(spark, f"{state_dir}/sigs")
    if sigs_all is not None:
        sigs = sigs_all.join(F.broadcast(ids_df), "id", "left_anti")
        tmp_s = f"{state_dir}/sigs__tmp_{uuid.uuid4().hex}"
        sigs.write.mode("overwrite").parquet(tmp_s)
        _swap_dir(tmp_s, f"{state_dir}/sigs")
    remaining = read_store(spark, f"{state_dir}/corpus")
    if remaining is None:
        # full retraction: Spark writes no part files for an all-empty
        # result, so the swapped-in corpus dir reads as absent — the hash
        # store must still be rebuilt (to empty), not left stale
        hashes = spark.createDataFrame([], "h string")
    else:
        hashes = remaining.select(F.md5(F.col("text")).alias("h")).distinct()
    tmp_h = f"{state_dir}/hashes__tmp_{uuid.uuid4().hex}"
    hashes.write.mode("overwrite").parquet(tmp_h)
    _swap_dir(tmp_h, f"{state_dir}/hashes")
