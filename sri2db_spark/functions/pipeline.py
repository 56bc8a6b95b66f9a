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

from ..localframe import local_df

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
    token_count=None,
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
       packing/budgeting by default; pass ``token_count``
       (e.g. :func:`..tokenize.bpe_tokenizer`) to denominate in trainer
       tokens.
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
        (token_count or token_count_ws)(F.col(text_col)).alias("n_tokens"),
        "quality",
    )


def curate_full(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_quality: float = 0.24,
    w: int = 4,
    drop_threshold_e6: int = 500_000,
    margin: int = 2,
    weights: dict[str, float] | None = None,
    budget_tokens: int = 15_000,
    target_tokens: int = 512,
    shuffle_parts: int = 16,
    n_shards: int = 16,
    return_stages: bool = False,
    seg_uid_base: int = 1_000_000,
    tokenizer=None,
):
    """The FULL composed curation pipeline — every stage a real 100 TB
    run chains, in order, as one driver program:

    1. quality filter (codegen predicate in the scan stage)
    2. exact dedup, first-id-wins (one md5 hash-agg + semi-join)
    3. MinHash-LSH near-dup → connected components → min-id survivors
    4. span-level benchmark decontamination: drop > threshold, splice the
       margined contaminated spans out of the rest, re-chunk segments
       (segment uid = doc_id·1_000_000 + seg — decontaminate_corpus
       re-chunks, so downstream stages treat segments as documents; a
       document splicing into ≥ 1e6 segments raises rather than silently
       colliding with the next doc's uid range, and doc_id must stay
       below ~9.2e12 for the bigint product — both asserted)
    5. per-source quality calibration; the bottom decile is dropped
    6. mixing: per-source sampling rates from target ``weights`` and the
       token ``budget_tokens``, applied by engine-portable md5 bucket
    7. sequence packing to ``target_tokens``
    8. deterministic corpus shuffle (training order) + shard assignment

    Returns the packed-corpus manifest
    ``(uid, source, n_tokens, seq_id, shard, part, pos)`` — one row per
    surviving segment, everything a loader fleet needs. With
    ``return_stages=True`` returns ``(manifest, stages)`` where
    ``stages`` maps stage name → its output DataFrame, so a harness can
    time/materialize each boundary.

    Every stage is deterministic and engine-replayable (integer/md5
    arithmetic; the one double — the mixing rate — is a single IEEE
    div/mult chain), so the whole composition is oracle-checkable
    bit-for-bit; ``corpus_pipeline_full`` in the registry does exactly
    that.
    """
    from .dedup import dedup_survivors, minhash_lsh_pairs  # noqa: PLC0415
    from .layout import _md5_bucket, corpus_shuffle, shard_assign  # noqa: PLC0415
    from .text import (  # noqa: PLC0415
        calibrate_quality,
        decontaminate_corpus,
        mixing_rates,
        pack_sequences,
    )

    stages: dict[str, DataFrame] = {}
    scored = docs.withColumn("quality", quality_score(F.col(text_col))).filter(
        F.col("quality") >= min_quality
    )
    reps = (
        scored.groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    deduped = scored.join(reps, id_col, "left_semi")
    stages["exact_dedup"] = deduped
    pairs = minhash_lsh_pairs(
        deduped, id_col, text_col, k=3, num_perm=128, bands=64, threshold=0.5
    )
    surv = dedup_survivors(deduped, pairs, id_col)
    # materialize the survivors ONCE: this frame is consumed three times
    # downstream (decontaminate_corpus's gram-occurrence scan, its splice
    # doc frame, and the source join below) and each consumption would
    # otherwise replay the corpus scan + quality filter + exact-dedup
    # semi-join + near-dup anti-join (measured ~3x survivors-chain replay
    # at sf10 in tools/pipeline_e2e.py before this boundary)
    surv = surv.localCheckpoint(eager=True)
    stages["neardup_survivors"] = surv
    dec = decontaminate_corpus(
        surv,
        benchmark,
        id_col,
        text_col,
        w=w,
        drop_threshold_e6=drop_threshold_e6,
        margin=margin,
    )
    # segment uid = doc_id * seg_uid_base + seg. Guarded, not assumed:
    # a long web document with scattered contamination at small w CAN
    # splice into unboundedly many segments, and a silent collision with
    # doc_id+1's uid range would corrupt every downstream join (the
    # oracle replays the same arithmetic, so external grading could never
    # catch it). raise_error makes the corpus extreme loud instead.
    uid_ok = (F.col("seg") >= 0) & (F.col("seg") < F.lit(seg_uid_base)) & (
        F.col(id_col).cast("bigint") < F.lit(9_000_000_000_000)
    )
    uid_expr = F.when(
        uid_ok,
        F.col(id_col).cast("bigint") * F.lit(seg_uid_base) + F.col("seg"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "curate_full: uid composition out of range (doc_id=%s, "
                "seg=%s, base=%s) — document spliced into too many "
                "segments or doc_id too large; raise seg_uid_base or "
                "re-key",
                F.col(id_col).cast("string"),
                F.col("seg").cast("string"),
                F.lit(str(seg_uid_base)),
            )
        ).cast("bigint")
    )
    clean = (
        dec.filter(F.col("action") != "drop")
        .select(
            uid_expr.alias("uid"),
            F.col(id_col).alias("__did"),
            F.col("clean_text"),
        )
        .join(
            surv.select(
                F.col(id_col).alias("__did"), F.col(source_col).alias("source")
            ),
            "__did",
        )
        .drop("__did")
    )
    # materialize the cleaned corpus ONCE: everything upstream (LSH pair
    # generation, connected components, the splice) is the expensive half
    # of the pipeline, and without this boundary the calibration build,
    # the mixing aggregate, the packing prefix sum, the shuffle keys and
    # the manifest joins would each replay it (measured 5-7 upstream
    # recomputes at sf10 in tools/pipeline_e2e.py)
    clean = clean.localCheckpoint(eager=True)
    stages["decontaminate"] = clean
    cal = calibrate_quality(clean, "uid", "clean_text", "source")
    keep = cal.filter(F.col("decile") >= 1).select(F.col("id").alias("uid"))
    corp = clean.join(keep, "uid")
    stages["calibration_filter"] = corp
    weights = weights or {}
    # tokenizer: Column→Column token counter for every budget-bearing
    # stage (mixing rates AND packing) — budgets are denominated in the
    # tokens a trainer actually sees (functions.tokenize.bpe_tokenizer);
    # whitespace default preserves the historical accounting
    rates = mixing_rates(
        corp, "uid", "clean_text", "source", weights, budget_tokens,
        token_count=tokenizer,
    ).select("source", F.floor(F.col("sample_rate") * 1_000_000).alias("__thr"))
    mixed = corp.join(rates, "source").filter(
        _md5_bucket(F.col("uid"), 1_000_000) < F.col("__thr")
    ).drop("__thr")
    # second boundary: the mixed corpus feeds packing, shuffle keys and
    # two manifest joins — materialize so the calibration join above runs
    # once, not three times
    mixed = mixed.localCheckpoint(eager=True)
    stages["mixing"] = mixed
    packed = pack_sequences(
        mixed, "uid", "clean_text", target_tokens, token_count=tokenizer
    )
    shuf = corpus_shuffle(mixed, "uid", seed="42", n_parts=shuffle_parts)
    manifest = (
        mixed.select("uid", "source")
        .join(packed.select(F.col("doc_id").alias("uid"), "n_tokens", "seq_id"), "uid")
        .join(shuf.select(F.col("uid"), "part", "pos"), "uid")
    )
    manifest = shard_assign(manifest, "uid", n_shards).select(
        "uid", "source", "n_tokens", "seq_id", "shard", "part", "pos"
    )
    stages["manifest"] = manifest
    if return_stages:
        return manifest, stages
    return manifest


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
    for (sub, df), key in zip(pieces, ("h", "id", "id")):
        path = f"{state_dir}/{sub}"
        if committer is not None and committer.versioned:
            fs = committer.fs
            tmp = committer.stage(path)
            df.write.mode("overwrite").parquet(fs.spark_path(tmp))
            # bootstrap pruning stats with the data: the very first
            # retraction already rewrites O(touched files), not O(store)
            stats = _collect_version_stats(df.sparkSession, fs, tmp, key)
            if stats is not None:
                _write_prune_stats(fs, tmp, key, stats)
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
    token_count=None,
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

    ``committer`` (object-store deployments): state reads resolve the
    compacted base through the manifest pointer plus ``batch_id=*``
    appends. A versioned committer requires ``batch_token`` when
    ``update_state`` — plain appends would scatter flat files into the
    versioned layout.
    """
    from .dedup import incremental_neardup_pairs, oph_signatures  # noqa: PLC0415
    from .statestore import read_store, write_store_batch  # noqa: PLC0415

    versioned = committer is not None and committer.versioned
    if versioned and update_state and batch_token is None:
        raise ValueError(
            "a versioned committer requires batch_token for state updates "
            "(appends are addressed to batch_id=<token> subdirectories)"
        )
    scored = batch.withColumn("quality", quality_score(F.col(text_col)))
    q = scored.filter(F.col("quality") >= min_quality)
    old_hashes = read_store(
        spark, f"{state_dir}/hashes", exclude_token=batch_token, committer=committer
    )
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
    old_corpus = read_store(
        spark, f"{state_dir}/corpus", exclude_token=batch_token, committer=committer
    )
    batch_docs = batch.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    lookup = (
        old_corpus.unionByName(batch_docs) if old_corpus is not None else batch_docs
    )
    sigs_all = oph_signatures(batch, id_col, text_col).persist()
    pairs = incremental_neardup_pairs(
        spark, f"{state_dir}/sigs", batch, lookup, "id", "text",
        threshold=neardup_threshold, update_store=False, new_sigs=sigs_all,
        batch_token=batch_token, committer=committer,
    )
    drops = pairs.select(F.col("id_b").alias("__drop")).distinct()
    q = q.join(drops, F.col(id_col) == F.col("__drop"), "left_anti")
    out = q.select(
        F.col(id_col),
        F.col(strata_col),
        # token_count seam: budget-faithful counting (see curate_full)
        (token_count or token_count_ws)(F.col(text_col)).alias("n_tokens"),
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
            store_fs = committer.fs if versioned else None
            write_store_batch(
                new_hashes, f"{state_dir}/hashes", batch_token, fs=store_fs
            )
            write_store_batch(
                new_sigs, f"{state_dir}/sigs", batch_token, fs=store_fs
            )
            write_store_batch(
                new_corpus, f"{state_dir}/corpus", batch_token, fs=store_fs
            )
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


def _replay_protected(batch_dirs) -> set[str]:
    """Names of the ``batch_id=*`` dirs compaction must preserve as-is:
    the batch a live stream may still REPLAY (its replay-safety depends on
    the current-token path exclusion in :func:`~.statestore.read_store` —
    rows folded flat would escape that exclusion and the replay would
    anti-join its own documents out of the output).

    Preserved = the highest-NUMERIC-token dir AND the newest-mtime dir
    (usually the same one). They differ exactly when a stream's checkpoint
    was reset (batch ids restarted at 0) over a reused state dir — the
    live replayable batch (token 0) then sorts below stale high-token
    dirs, and preserving only by token would fold it flat. Preserving the
    union covers both the token-monotonic and the checkpoint-reset case at
    the cost of one extra uncompacted dir; mtime alone is not trusted
    either, because a cp/tar-restored store can carry equal or inverted
    mtimes.

    ``batch_dirs`` is a list of ``(name, mtime)`` tuples."""
    if not batch_dirs:
        return set()

    def _by_token(entry):
        name, mtime = entry
        token = name.split("=", 1)[1]
        try:
            return (1, int(token), "")
        except ValueError:
            return (0, mtime, token)

    return {
        max(batch_dirs, key=_by_token)[0],
        max(batch_dirs, key=lambda entry: entry[1])[0],
    }


def compact_curation_state(
    spark, state_dir: str, committer=None, incremental: bool = False
) -> dict[str, tuple[int, int]]:
    """Compact the append-only curation state: every ingest batch appends a
    file-set to each store, so after thousands of batches each store is
    thousands of small files and every batch's state read pays the per-file
    open cost. Compaction rewrites each store as one coalesced file-set and
    drops the duplicate rows a crashed-and-replayed batch may have appended
    (stores are membership sets — hashes dedup on h, sigs/corpus on id).
    Returns {store: (files_before, files_after)}. Handles both flat stores
    and the batch-id-addressed layout streaming ingest writes (compaction
    collapses ``batch_id=*`` subdirectories back into one compacted base;
    subsequent batches add fresh subdirectories alongside it).

    Replay-protected ``batch_id=*`` subdirectories (see
    :func:`_replay_protected`: the highest-token AND the newest-mtime dir,
    covering the checkpoint-reset case) are preserved as-is, never folded:
    a stream batch that crashed after its state write but before its
    checkpoint commit will be REPLAYED with the same token, and its
    replay-safety depends on the current-token path exclusion in
    :func:`~.statestore.read_store` — rows folded into the base would
    escape that exclusion and the replay would anti-join its own documents
    out of the output. Only committed history (everything older) is
    compacted; the last batch is folded by a later compaction once newer
    batches exist.

    **Commit protocol.** Without a ``committer`` the store is swapped with
    two directory renames — correct locally, but NOT atomic to concurrent
    readers (between the renames the store is briefly absent), so quiesce
    the stream first. With a versioned ``committer``
    (:class:`...sinks.committer.ManifestCommitter` — object-store
    deployments), the compacted base is staged as a version directory and
    published with ONE atomic pointer write: a reader mid-compaction
    resolves the old base or the new base, never a missing store. The
    folded sources (old base, flat files, folded ``batch_id=*`` dirs) are
    cleaned up AFTER the pointer commit; a crash in between leaves only
    garbage the new base's ``_FOLDED`` marker already fences off from
    reads (see :func:`_write_folded_marker`), never a partial store or a
    duplicate row. A flat legacy store is MIGRATED by this call: its files
    fold into the first committed version.

    The pointer write is a compare-and-swap against the base version this
    compaction read (``expected_basis``): if another maintenance op
    commits the same store concurrently, this one raises
    :class:`...sinks.committer.CommitConflict` instead of silently
    overwriting it — re-run to compact the new state.

    **Incremental mode** (``incremental=True``, versioned committer
    only): the scheduled-compaction shape for large stores. Only the
    appends and flats are rewritten; the ENTIRE existing base is carried
    by reference (``_CARRY`` — see :func:`_commit_state_rewrite`), so the
    write cost is O(appended batches), not O(store): folding a day's
    batches into a 10⁵-file base stops costing a 10⁵-file rewrite.
    Cross-duplicates (an append row already in the base — a crashed
    pre-checkpoint batch replayed after ITS dir was folded) are dropped
    with an anti-join whose base-side read is PRUNED by the fold's key
    window against the base's ``_PRUNE_STATS`` — for monotonic ids the
    probe touches a handful of files; worst case it is a read-only
    base scan, never a rewrite. Run the full mode occasionally to
    re-coalesce the base itself and release carried version dirs. A base
    predating pruning stats keeps its carry but publishes no stats (the
    store stays correct, just unprunable until a full compaction).
    """
    import os  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    from .statestore import (  # noqa: PLC0415
        CARRY_MARKER,
        FOLDED_MARKER,
        list_store_files,
        resolve_carried,
    )

    from ..sinks.fs import LocalFS  # noqa: PLC0415

    versioned = committer is not None and committer.versioned
    if incremental and not versioned:
        raise ValueError(
            "incremental compaction publishes the base by reference "
            "(_CARRY), which needs the versioned ManifestCommitter — the "
            "rename backend has no retained version directories to "
            "reference"
        )

    def _count_files(path: str) -> int:
        # route through the committer's fs when one manages the store —
        # preserved-batch counting must list the same backend the store
        # lives on, not the local disk
        lister_fs = committer.fs if versioned else LocalFS()
        return len(lister_fs.walk_files(path))

    report: dict[str, tuple[int, int]] = {}
    for sub, keys in (("hashes", ["h"]), ("sigs", ["id"]), ("corpus", ["id"])):
        path = f"{state_dir}/{sub}"
        lister = committer.fs if versioned else None
        if (lister and not lister.isdir(path)) or (
            not lister and not os.path.isdir(path)
        ):
            continue
        if versioned:
            fs = committer.fs
            # CAS basis: captured BEFORE anything is read, so any commit
            # that lands on this store in between conflicts our commit
            basis = committer.current_version(path)
            batch_dirs = [
                (n, fs.getmtime(os.path.join(path, n)))
                for n in fs.listdir(path)
                if n.startswith("batch_id=")
                and fs.isdir(os.path.join(path, n))
            ]
            # appends the CURRENT base's _FOLDED marker records as already
            # folded into it (a prior maintenance op crashed before its
            # cleanup): their rows are superseded — a retraction may have
            # REMOVED some of them — so they must be deleted, never
            # re-merged, and they are not live replay candidates either.
            # Fencing is by exact FILE name (Spark part files carry a
            # per-job uuid): a dir is stale only when every parquet file
            # in it was folded — a checkpoint-reset batch that reuses a
            # fenced dir NAME has fresh file names and stays live. Legacy
            # bare-dir entries keep the old mtime guard.
            base = committer.resolve(path, basis)
            prior_folded: set[str] = set()
            marker_mtime = 0.0
            if base is not None:
                marker = os.path.join(base, FOLDED_MARKER)
                if fs.exists(marker):
                    prior_folded = set(fs.read(marker).splitlines())
                    marker_mtime = fs.getmtime(marker)
            fence_by_dir, fence_flat, fence_legacy = _parse_fence(prior_folded)

            def _dir_is_stale(n: str, mt: float) -> bool:
                if n in fence_legacy and mt <= marker_mtime:
                    return True
                inside = {
                    os.path.basename(f)
                    for f in fs.walk_files(os.path.join(path, n))
                }
                return bool(inside) and inside <= fence_by_dir.get(n, set())

            stale = {n for n, mt in batch_dirs if _dir_is_stale(n, mt)}
            batch_dirs = [(n, mt) for n, mt in batch_dirs if n not in stale]
        else:
            batch_dirs = [
                (e.name, os.path.getmtime(e.path))
                for e in os.scandir(path)
                if e.is_dir() and e.name.startswith("batch_id=")
            ]
        preserve = _replay_protected(batch_dirs)
        n_preserved = sum(
            _count_files(os.path.join(path, name)) for name in preserve
        )
        if versioned:
            # fold: root flat files (a legacy store being migrated), the
            # committed base, and every non-preserved live batch append
            flat_all = [
                os.path.join(path, n)
                for n in fs.listdir(path)
                if n.endswith(".parquet")
            ]
            # the fence covers root flat files too: a flat file the
            # CURRENT base's marker lists was already folded by a prior
            # (crashed) rewrite — its rows are superseded, possibly by a
            # retraction, so it must be deleted, never re-merged (exact
            # name match; flat part files are uuid-named and never recur)
            stale_flat = [
                f for f in flat_all if os.path.basename(f) in fence_flat
            ]
            flat = [f for f in flat_all if f not in set(stale_flat)]
            files = list(flat)
            base_files: list[str] = []
            if base is not None:
                # files a pruned maintenance op published by reference
                # (_CARRY) are part of the base — walking only the base
                # dir would silently drop their rows from the compaction
                base_files = fs.walk_files(base) + resolve_carried(
                    fs, path, base
                )
            inc = incremental and base is not None
            if not inc:
                files += base_files
            folded_dirs = [
                os.path.join(path, n)
                for n, _ in batch_dirs
                if n not in preserve
            ]
            for d in folded_dirs:
                # same per-file exclusion as reads: a live dir never mixes
                # fenced and fresh files in practice (overwrite clears it),
                # but folding must not be LOOSER than reading — a fenced
                # file's rows may have been retracted
                dn = os.path.basename(d)
                files += [
                    f
                    for f in fs.walk_files(d)
                    if os.path.basename(f) not in fence_by_dir.get(dn, set())
                ]
            if not files:
                # nothing to fold — still complete a crashed prior run's
                # cleanup so re-running maintenance converges: the stale
                # dirs and fenced files are read-excluded already, and
                # removing them needs no commit
                for n in stale:
                    fs.rmtree(os.path.join(path, n))
                for f in stale_flat:
                    fs.remove(f)
                _sweep_fenced_garbage(fs, path, base)
                continue
            n_before = len(files) + (len(base_files) if inc else 0) + n_preserved
            df = spark.read.parquet(
                *[fs.spark_path(f) for f in files]
            ).dropDuplicates(keys)
            carry_rels: list[str] = []
            carried_stats = None
            if inc:
                rel_of = {f: os.path.relpath(f, path) for f in base_files}
                carry_rels = sorted(rel_of.values())
                base_stats = _read_prune_stats(fs, base)
                probe = base_files
                if base_stats is not None and all(
                    r in base_stats["files"] for r in carry_rels
                ):
                    carried_stats = {
                        r: base_stats["files"][r] for r in carry_rels
                    }
                    # prune the cross-dup probe by the fold's key window:
                    # monotonic ids make this a handful of base files
                    w = df.agg(
                        F.min(keys[0]).alias("lo"), F.max(keys[0]).alias("hi")
                    ).first()
                    if w["lo"] is not None:
                        probe = [
                            f
                            for f in base_files
                            if _ranges_overlap(
                                base_stats["files"][rel_of[f]],
                                w["lo"],
                                w["hi"],
                            )
                        ]
                if probe:
                    # rows already in the base must not re-enter through
                    # the fold (a replayed batch whose dir was folded):
                    # read-only anti-join, never a base rewrite
                    df = df.join(
                        spark.read.parquet(
                            *[fs.spark_path(f) for f in probe]
                        ),
                        keys,
                        "left_anti",
                    )
            n_out = max(1, df.rdd.getNumPartitions() // 8)
            tmp = committer.stage(path)
            df.coalesce(n_out).write.mode("overwrite").parquet(
                fs.spark_path(tmp)
            )
            # pruning stats (full mode: the whole rewritten base; inc
            # mode: new files + the base's entries — skipped entirely if
            # the base predates stats, so stats are never partial)
            stats = _collect_version_stats(spark, fs, tmp, keys[0])
            if stats is not None and not (
                inc and base_files and carried_stats is None
            ):
                stats.update(carried_stats or {})
                _write_prune_stats(fs, tmp, keys[0], stats)
            if carry_rels:
                fs.put(
                    os.path.join(tmp, CARRY_MARKER), "\n".join(carry_rels)
                )
            # stale entries carry forward: if OUR cleanup also crashes,
            # the new base still fences them off from reads
            still_flat = {os.path.basename(f) for f in stale_flat}
            carried = sorted(
                e
                for e in prior_folded
                if e.split("/", 1)[0] in stale or e in still_flat
            )
            _write_folded_marker(
                fs,
                tmp,
                _fold_file_entries(
                    fs,
                    path,
                    [os.path.basename(f) for f in flat]
                    + [os.path.basename(d) for d in folded_dirs],
                )
                + carried,
            )
            committer.commit(tmp, path, expected_basis=basis)
            # post-commit cleanup; a crash here leaves garbage dirs that
            # reads already exclude via the _FOLDED marker
            for f in flat:
                fs.remove(f)
            for d in folded_dirs:
                fs.rmtree(d)
            for n in stale:
                fs.rmtree(os.path.join(path, n))
            for f in stale_flat:
                fs.remove(f)
            new_base = committer.resolve(path)
            report[sub] = (
                n_before,
                (len(fs.walk_files(new_base)) if new_base else 0)
                + len(carry_rels)
                + n_preserved,
            )
            continue
        files = list_store_files(spark, path)
        for name in preserve:
            files = [f for f in files if f"/{name}/" not in f]
        if not files:
            continue
        n_before = len(files) + n_preserved
        df = spark.read.parquet(*files).dropDuplicates(keys)
        n_out = max(1, df.rdd.getNumPartitions() // 8)
        tmp = f"{path}__tmp_{uuid.uuid4().hex}"
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
        # COPY (not rename) the protected batches into the new layout:
        # the originals stay in place until the swap, so a crash
        # anywhere before _swap_dir leaves the live store fully
        # intact (tmp is orphan garbage, never a silent subset loss).
        # Cost is one or two batches' files — O(batch), not O(store).
        import shutil  # noqa: PLC0415

        for name in preserve:
            shutil.copytree(
                os.path.join(path, name), os.path.join(tmp, name)
            )
        _swap_dir(tmp, path)
        report[sub] = (n_before, _count_files(path))
    return report


def _batch_token(name: str) -> int | None:
    """The integer token of a ``batch_id=N`` directory name, or ``None``
    for an unparseable one — THE parser for the batch-addressing scheme,
    shared by compaction, retraction, and the doctor."""
    try:
        return int(name.split("=", 1)[1])
    except ValueError:
        return None


def compact_batch_output(
    spark,
    out_dir: str,
    keys: list[str] | None = None,
    fs=None,
    incremental: bool = False,
) -> tuple[int, int]:
    """Compact a batch-id-addressed OUTPUT directory (the curated-corpus
    ``out_dir`` / near-dup ``pairs_dir`` / signature ``store_dir`` a
    streaming run accumulates as one ``batch_id=N`` subdirectory per
    micro-batch — thousands of small file-sets after a long run).

    The fold keeps the ``batch_id=`` layout: all non-replay-protected
    numeric-token dirs (and any legacy flat files at the root) collapse
    into ONE new base dir addressed ``batch_id=<t>`` with the next
    NEGATIVE token ``t`` — Structured Streaming batch ids start at 0, so
    negative tokens never collide with a live stream, and both plain
    ``spark.read.parquet(out_dir)`` consumers and the incremental
    wrappers' basePath reads (which exclude ``batch_id != current``) keep
    working unchanged. Replay-protected dirs (highest token + newest
    mtime, :func:`_replay_protected`) are preserved untouched, exactly as
    in :func:`compact_curation_state` — a replayed batch must still
    overwrite its own dir, not find its rows folded elsewhere.

    ``keys``: optional columns to ``dropDuplicates`` on during the fold
    (e.g. the id column of a survivors output); ``None`` folds verbatim.

    Crash contract: the new base is fully written BEFORE the folded
    sources are removed — a crash in between leaves transient duplicate
    rows (the next compaction's fold removes them when ``keys`` is set),
    never missing rows. Do not run concurrently with an active stream
    writing the same directory.

    ``fs``: the filesystem the output lives on (defaults to the local
    disk) — pass the committer's object-store binding to run this
    maintenance against s3/gcs; every listing, deletion, and Spark path
    goes through it.

    ``incremental``: minor compaction for the scheduled case. The full
    fold re-reads and re-writes every prior NEGATIVE-token base each
    run, so compacting the curated-corpus output — the largest table the
    pipeline produces — costs O(output) per schedule tick. Incremental
    folds only the positive-token batch dirs and flats into the next
    negative token and leaves prior bases untouched: write cost is
    O(appended batches), and one extra base dir accrues per tick. With
    ``keys``, cross-base duplicates are still dropped — the fold
    anti-joins against a READ of the retained bases (read-only; at 100
    TB this is the same read-don't-rewrite trade as the state layer's
    hash liveness probe). Run the full fold occasionally to re-coalesce
    the accumulated bases.

    Returns ``(files_before, files_after)``.
    """
    import os  # noqa: PLC0415

    from ..sinks.fs import LocalFS  # noqa: PLC0415

    fs = fs or LocalFS()
    if not fs.isdir(out_dir):
        return (0, 0)
    # finish interrupted retraction folds BEFORE planning the fold: a
    # committed retraction whose source removal was interrupted still has
    # its sources on disk, and folding them together with the survivors'
    # base would RESURRECT the retracted victims permanently (and
    # duplicate the survivors). Marker-without-sentinel bases are NOT
    # discarded here — from this (possibly scheduled, possibly concurrent
    # with a live retraction) path they are indistinguishable from a fold
    # currently mid-write, so they are excluded from the fold instead:
    # always safe, and the next retraction run discards true corpses.
    _retraction_partials = set(
        _sweep_retraction_folds(out_dir, fs, discard_partial=False)
    )

    _parquet_under = fs.walk_files

    names = fs.listdir(out_dir)
    flat = [
        os.path.join(out_dir, n)
        for n in names
        if n.endswith(".parquet") and not fs.isdir(os.path.join(out_dir, n))
    ]
    batch_dirs = [
        (n, fs.getmtime(os.path.join(out_dir, n)))
        for n in names
        if n.startswith("batch_id=") and fs.isdir(os.path.join(out_dir, n))
    ]
    _numeric = _batch_token
    # replay protection applies to LIVE stream batches only — negative
    # tokens are this function's own fold outputs (streaming batch ids
    # start at 0), can never be replayed, and must not soak up the
    # newest-mtime slot (a just-written base would otherwise survive
    # every subsequent full fold)
    preserve = _replay_protected(
        [(n, mt) for n, mt in batch_dirs if (_numeric(n) or 0) >= 0]
    )
    foldable = [
        name
        for name, _ in batch_dirs
        if name not in preserve
        and name not in _retraction_partials
        and _numeric(name) is not None
        and not (incremental and _numeric(name) < 0)
    ]
    n_total = len(_parquet_under(out_dir))
    if len(foldable) + len(flat) < 2:
        return (n_total, n_total)  # nothing to gain
    files = list(flat)
    for name in foldable:
        files += _parquet_under(os.path.join(out_dir, name))
    if not files:
        return (n_total, n_total)
    tokens = [t for t in (_numeric(n) for n, _ in batch_dirs) if t is not None]
    # the [0, ...] floor also covers a legacy dir holding ONLY flat root
    # files (no batch_id=* subdirs): the fold then lands at batch_id=-1
    new_token = min([0, *tokens]) - 1
    df = spark.read.parquet(*[fs.spark_path(f) for f in files])
    if keys:
        df = df.dropDuplicates(keys)
        if incremental:
            # minor fold: prior bases are not rewritten, so a replayed
            # batch's duplicate of an already-folded row is dropped via a
            # read-only anti-join against the retained bases
            base_files: list[str] = []
            for name, _ in batch_dirs:
                t = _numeric(name)
                if t is not None and t < 0:
                    base_files += _parquet_under(os.path.join(out_dir, name))
            if base_files:
                df = df.join(
                    spark.read.parquet(
                        *[fs.spark_path(f) for f in base_files]
                    ).select(*keys),
                    keys,
                    "left_anti",
                )
    n_out = max(1, df.rdd.getNumPartitions() // 8)
    df.coalesce(n_out).write.mode("overwrite").parquet(
        fs.spark_path(f"{out_dir}/batch_id={new_token}")
    )
    # sources removed only after the new base is complete (see docstring)
    for f in flat:
        fs.remove(f)
    for name in foldable:
        fs.rmtree(os.path.join(out_dir, name))
    return (n_total, len(_parquet_under(out_dir)))


def retract_from_output(
    spark,
    out_dir: str,
    ids,
    id_col: str = "doc_id",
    fs=None,
) -> int:
    """Right-to-be-forgotten for a batch-id-addressed OUTPUT directory —
    the missing half of :func:`retract_from_state`: that function scrubs
    the DERIVED stores (hashes/signatures/corpus) so the deleted text
    stops influencing future dedup decisions, but the curated corpus the
    pipeline already PUBLISHED still holds the documents. This removes
    them from the output itself. Returns the number of rows removed.

    **O(touched batches), not O(output).** One column-pruned probe (the
    id column + the ``batch_id`` partition value) finds the dirs holding
    victims; their SURVIVOR rows fold into one new negative-token base
    dir (same addressing as :func:`compact_batch_output` — streaming
    batch ids start at 0, so negative tokens never collide with a live
    stream), and only then are the touched dirs removed. Every untouched
    ``batch_id=N`` directory is byte-identical afterwards. Legacy flat
    root files are probed too and fold the same way when hit.

    Crash contract: the fold is two-phase via a ``_RETRACT_SOURCES``
    marker written into the new base BEFORE the survivors (listing the
    source units it replaces) and a ``_RETRACT_COMMITTED`` sentinel
    written AFTER them — every later run first sweeps prior folds: a
    marked base without the sentinel died mid-write (sources all intact)
    and is discarded; a marked base WITH it is a committed fold whose
    interrupted source removal is finished. Between
    fold-complete and removal, readers transiently see the victims plus
    survivor duplicates — never lost rows. Identity is NEVER used for
    recovery, so an output that legitimately holds duplicate ids across
    batches (``compact_batch_output`` with ``keys=None`` folds verbatim)
    keeps every duplicate of a non-victim row. Quiesce the stream first,
    and retract from the UPSTREAM source as well: a later replayed
    micro-batch rewrites its own dir from source data, so a document not
    deleted upstream would be re-published by the next replay.

    ``ids`` is a Python list or a single-column DataFrame (broadcast
    drop-set either way, never a giant ``isin``); ``fs`` (default local)
    is the filesystem the output lives on — pass the committer's
    object-store binding to run this against s3/gcs."""
    import os  # noqa: PLC0415

    from ..sinks.fs import LocalFS  # noqa: PLC0415

    fs = fs or LocalFS()
    if not fs.isdir(out_dir):
        return 0
    if not isinstance(ids, DataFrame) and not ids:
        return 0
    _sweep_retraction_folds(out_dir, fs)
    if isinstance(ids, DataFrame):
        drop = ids.select(F.col(ids.columns[0]).alias("__rid")).distinct()
    else:
        drop = local_df(spark, [(i,) for i in ids], ["__rid"]).distinct()

    names = fs.listdir(out_dir)
    flat = [
        os.path.join(out_dir, n)
        for n in names
        if n.endswith(".parquet") and not fs.isdir(os.path.join(out_dir, n))
    ]
    batch_dirs = [
        n
        for n in names
        if n.startswith("batch_id=") and fs.isdir(os.path.join(out_dir, n))
    ]

    _numeric = _batch_token
    n_victims = 0
    touched: set[int] = set()
    batch_files = [
        f
        for n in batch_dirs
        for f in fs.walk_files(os.path.join(out_dir, n))
    ]
    if batch_files:
        probe = spark.read.option("basePath", fs.spark_path(out_dir)).parquet(
            *[fs.spark_path(f) for f in batch_files]
        )
        hits = (
            probe.select(id_col, "batch_id")
            .join(
                F.broadcast(drop), F.col(id_col) == F.col("__rid"), "left_semi"
            )
            .groupBy("batch_id")
            .count()
            .collect()
        )
        touched = {r["batch_id"] for r in hits}
        n_victims += sum(r["count"] for r in hits)
    flat_hit = 0
    if flat:
        fdf = spark.read.parquet(*[fs.spark_path(f) for f in flat])
        flat_hit = fdf.join(
            F.broadcast(drop), F.col(id_col) == F.col("__rid"), "left_semi"
        ).count()
        n_victims += flat_hit
    if not touched and not flat_hit:
        return 0

    touched_dirs = [n for n in batch_dirs if _numeric(n) in touched]
    src_files = [
        f
        for n in touched_dirs
        for f in fs.walk_files(os.path.join(out_dir, n))
    ]
    if flat_hit:
        src_files += flat
    # marker entries are exact data-FILE paths relative to out_dir, never
    # bare dir names: Spark part-file names carry a per-job UUID, so a
    # checkpoint-reset replay that reuses a batch_id DIRECTORY name writes
    # different file names and a later sweep cannot delete its rows (same
    # fencing rationale as _write_folded_marker)
    src_units = [os.path.relpath(f, out_dir) for f in src_files]
    tokens = [t for t in (_numeric(n) for n in batch_dirs) if t is not None]
    new_token = min([0, *tokens]) - 1
    survivors = spark.read.parquet(
        *[fs.spark_path(f) for f in src_files]
    ).join(F.broadcast(drop), F.col(id_col) == F.col("__rid"), "left_anti")
    if survivors.limit(1).count():
        # two-phase fold: marker FIRST (names the source units this base
        # replaces), survivors APPENDED around it (append preserves the
        # marker), then OUR OWN commit sentinel — never Spark's _SUCCESS,
        # which disappears entirely under
        # mapreduce.fileoutputcommitter.marksuccessfuljobs=false (a common
        # object-store tuning) and would make every committed fold look
        # like mid-write garbage to the sweep. Marker-without-sentinel
        # unambiguously means "died mid-write, sources intact" — see
        # _sweep_retraction_folds. Recovery never consults row identity,
        # so legitimately duplicated ids in the output survive intact.
        base_dir = f"{out_dir}/batch_id={new_token}"
        fs.makedirs(base_dir)
        fs.put(
            os.path.join(base_dir, RETRACT_MARKER),
            "\n".join(sorted(src_units)),
        )
        n_out = max(1, survivors.rdd.getNumPartitions() // 8)
        survivors.coalesce(n_out).write.mode("append").parquet(
            fs.spark_path(base_dir)
        )
        fs.put(os.path.join(base_dir, RETRACT_COMMITTED), "")
    # sources removed only after the survivors' base is complete; a
    # victims-only fold (no survivors) writes no base — removal itself is
    # the committed state, and a partial removal re-probes as touched
    for n in touched_dirs:
        fs.rmtree(os.path.join(out_dir, n))
    if flat_hit:
        for f in flat:
            fs.remove(f)
    return n_victims


#: marker file inside a retraction fold's negative-token base naming the
#: source units (top-level ``batch_id=N`` dirs / flat files) it replaces —
#: underscore-prefixed, so Spark's parquet reader ignores it as metadata
RETRACT_MARKER = "_RETRACT_SOURCES"

#: the fold's own commit sentinel, written by fs.put AFTER the survivors'
#: parquet write returns — deliberately not Spark's ``_SUCCESS``, which a
#: deployment can disable (marksuccessfuljobs=false) and whose absence
#: would then misclassify every committed fold as mid-write garbage
RETRACT_COMMITTED = "_RETRACT_COMMITTED"


def _sweep_retraction_folds(
    out_dir: str, fs, discard_partial: bool = True
) -> list[str]:
    """Finish or discard :func:`retract_from_output` folds that died
    mid-run. A negative-token base carrying :data:`RETRACT_MARKER`:

    - WITH :data:`RETRACT_COMMITTED`: a committed fold whose source
      removal was interrupted — remove any listed source FILES still on
      disk (their surviving rows already live in this base; their victim
      rows were the retraction's target), then drop batch dirs the
      removal emptied. Entries are exact part-file paths: a replayed
      micro-batch that reused a directory name wrote differently-named
      files, so its rows are untouchable by the sweep. Once every listed
      entry is confirmed gone the marker (and sentinel) are removed —
      otherwise every later maintenance tick re-probes the historical
      entry list with per-entry existence calls forever. Removal races
      with a concurrent finisher are tolerated (both remove the same
      stale files; already-gone is success).
    - WITHOUT it: died mid-write — the marker precedes the data, the
      sentinel follows it, and removal only starts after the sentinel,
      so every listed source is still intact and the partial base is
      pure garbage. Discarded only when ``discard_partial`` (the
      retraction path, operationally serialized per request):
      marker-without-sentinel is indistinguishable from a retraction
      CURRENTLY mid-write, so the scheduled-compaction path passes
      ``discard_partial=False`` and instead receives these base names
      back to EXCLUDE from its fold (deleting a live fold's dir would
      lose its survivors; excluding it is always safe).

    Identity-free by construction: recovery reasons about source FILES,
    never row ids, so outputs holding legitimate duplicate ids are never
    deduplicated as a retraction side effect. Returns the
    marker-without-sentinel base names still on disk (empty when
    ``discard_partial``)."""
    import os  # noqa: PLC0415

    partial: list[str] = []
    for n in fs.listdir(out_dir):
        full = os.path.join(out_dir, n)
        if not (n.startswith("batch_id=") and fs.isdir(full)):
            continue
        t = _batch_token(n)
        if t is None or t >= 0:
            continue
        marker = os.path.join(full, RETRACT_MARKER)
        if not fs.exists(marker):
            continue
        if fs.exists(os.path.join(full, RETRACT_COMMITTED)):
            parents: set[str] = set()
            entries = [e for e in fs.read(marker).splitlines() if e]
            for entry in entries:
                src = os.path.join(out_dir, entry)
                if fs.exists(src) and not fs.isdir(src):
                    try:
                        fs.remove(src)
                    except FileNotFoundError:
                        pass  # a concurrent finisher won; same outcome
                head = entry.split("/", 1)[0]
                if head.startswith("batch_id=") and head != n:
                    parents.add(os.path.join(out_dir, head))
            for p in parents:
                if fs.isdir(p) and not fs.walk_files(p):
                    fs.rmtree(p)
            if not any(
                fs.exists(os.path.join(out_dir, e)) for e in entries
            ):
                # fully swept: retire the marker so later ticks stop
                # re-probing the historical entry list. MARKER FIRST —
                # dropping the sentinel first would leave a
                # marker-without-sentinel window a concurrent/next run
                # classifies as a mid-write partial and DISCARDS (data
                # loss); a markerless orphan sentinel is inert
                try:
                    fs.remove(marker)
                    fs.remove(os.path.join(full, RETRACT_COMMITTED))
                except FileNotFoundError:
                    pass
        elif discard_partial:
            fs.rmtree(full)
        else:
            partial.append(n)
    return partial


def _write_folded_marker(fs, version_dir: str, folded: list[str]) -> None:
    """Record what this staged version folded. The marker is part of the
    immutable version directory, so the atomic pointer commit publishes the
    fold-set together with the base — readers
    (:func:`~.statestore.list_store_files`) exclude the listed entries even
    if a crash before the post-commit cleanup left them on disk.

    Entries are individual data FILES (``batch_id=N/part-….parquet`` for
    appends, bare ``part-….parquet`` for root flat files). Spark part-file
    names carry a per-job UUID, so exclusion by exact path is airtight:
    a checkpoint-reset batch that reuses a fenced DIRECTORY name writes
    new file names and stays fully visible — no mtime-granularity window
    (coarse object-store timestamps made ordering-based fencing unsafe).
    Bare ``batch_id=N`` directory entries from markers written by older
    versions are still honored, mtime-guarded as before."""
    import os  # noqa: PLC0415

    from .statestore import FOLDED_MARKER  # noqa: PLC0415

    fs.put(os.path.join(version_dir, FOLDED_MARKER), "\n".join(sorted(folded)))


def _fold_file_entries(fs, path: str, names: list[str]) -> list[str]:
    """Expand fold-source NAMES (``batch_id=*`` dir names and flat file
    basenames under ``path``) into per-file marker entries."""
    import os  # noqa: PLC0415

    entries: list[str] = []
    for n in names:
        full = os.path.join(path, n)
        if fs.isdir(full):
            entries += [
                f"{n}/{os.path.basename(f)}" for f in fs.walk_files(full)
            ]
        else:
            entries.append(n)
    return entries


def _parse_fence(prior: set[str]):
    """Split marker entries into (files-per-dir, flat file names, legacy
    dir names). See :func:`_write_folded_marker` for the entry forms."""
    by_dir: dict[str, set[str]] = {}
    flat: set[str] = set()
    legacy_dirs: set[str] = set()
    for e in prior:
        if "/" in e:
            d, f = e.split("/", 1)
            by_dir.setdefault(d, set()).add(f)
        elif e.endswith(".parquet"):
            flat.add(e)
        elif e:
            legacy_dirs.add(e)
    return by_dir, flat, legacy_dirs


def _read_prune_stats(fs, base: str | None) -> dict | None:
    """The base version's ``_PRUNE_STATS`` object, or ``None`` when the
    store is not prunable (no committed base / stats never written /
    unparseable — all of which mean: fall back to the full rewrite)."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    from .statestore import PRUNE_STATS  # noqa: PLC0415

    if base is None:
        return None
    p = os.path.join(base, PRUNE_STATS)
    if not fs.exists(p):
        return None
    try:
        obj = json.loads(fs.read(p))
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict) or not isinstance(obj.get("files"), dict):
        return None
    return obj


def _collect_version_stats(spark, fs, version_dir: str, key: str) -> dict | None:
    """Per-file ``[min, max]`` of ``key`` over the files just staged in
    ``version_dir`` — ONE tiny aggregation over data Spark just wrote (hot
    in the page cache), keyed by store-relative path
    (``v_<uuid>/part-….parquet``). Returns ``None`` when the key column is
    absent (the store simply stays unprunable)."""
    import os  # noqa: PLC0415
    from urllib.parse import unquote, urlparse  # noqa: PLC0415

    files = fs.walk_files(version_dir)
    if not files:
        return {}
    df = spark.read.parquet(*[fs.spark_path(f) for f in files])
    if key not in df.columns:
        return None
    vname = os.path.basename(version_dir.rstrip("/"))
    rows = (
        df.groupBy(F.input_file_name().alias("_file"))
        .agg(F.min(key).alias("_lo"), F.max(key).alias("_hi"))
        .collect()
    )
    return {
        f"{vname}/{os.path.basename(unquote(urlparse(r['_file']).path))}": [
            r["_lo"],
            r["_hi"],
        ]
        for r in rows
    }


def _write_prune_stats(fs, version_dir: str, key: str, files_stats) -> None:
    """Publish the pruning stats INTO the staged version (so the pointer
    commit publishes data + stats atomically). A key type JSON cannot
    carry (timestamps, binary) skips the write — pruning degrades to the
    full rewrite, never to a wrong one."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    from .statestore import PRUNE_STATS  # noqa: PLC0415

    if files_stats is None:
        return
    try:
        payload = json.dumps({"key": key, "files": files_stats})
    except (TypeError, ValueError):
        return
    fs.put(os.path.join(version_dir, PRUNE_STATS), payload)


def _ranges_overlap(rng, lo, hi) -> bool:
    """Whether a stats ``[min, max]`` range can intersect ``[lo, hi]`` —
    conservative (True) on null endpoints or mixed key types."""
    try:
        if rng[0] is None or rng[1] is None:
            return True
        return not (rng[1] < lo or hi < rng[0])
    except TypeError:
        return True


def _prune_plan(fs, path: str, base: str | None, files: list[str], values):
    """Split a store's resolved file list into the O(touched) maintenance
    plan: ``(rewrite_files, carry_rels, carried_stats)``.

    ``files`` is the EXACT list the reader resolved (base + carried +
    unfenced appends/flats — :func:`~.statestore.list_store_files`), so
    fence semantics are inherited, not re-implemented. A base/carried
    file whose ``_PRUNE_STATS`` range misses every retracted ``value``
    cannot hold an affected row and is CARRIED by reference (its
    store-relative path — always the ORIGINAL physical location, so carry
    chains never deepen); everything else (range hit, missing stats
    entry, null-range, appends, flats) is rewritten. Returns ``None``
    when the base has no usable stats — the caller falls back to the
    full rewrite, which is always correct."""
    import bisect  # noqa: PLC0415
    import os  # noqa: PLC0415

    stats = _read_prune_stats(fs, base)
    if stats is None:
        return None
    fstats = stats["files"]
    try:
        values_sorted = sorted(set(values))
    except TypeError:
        return None
    rewrite: list[str] = []
    carry: list[str] = []
    carried_stats: dict[str, list] = {}
    for f in files:
        rel = os.path.relpath(f, path)
        if not rel.split("/", 1)[0].startswith("v_"):
            rewrite.append(f)  # append/flat: always folded into the rewrite
            continue
        rng = fstats.get(rel)
        touched = True
        if rng is not None and rng[0] is not None and rng[1] is not None:
            try:
                i = bisect.bisect_left(values_sorted, rng[0])
                touched = (
                    i < len(values_sorted) and not rng[1] < values_sorted[i]
                )
            except TypeError:
                touched = True  # mixed key types: conservative rewrite
        if touched:
            rewrite.append(f)
        else:
            carry.append(rel)
            carried_stats[rel] = rng
    return rewrite, carry, carried_stats


def _sweep_fenced_garbage(fs, path: str, base: str | None) -> None:
    """Delete on-disk files the base's ``_FOLDED`` marker already fences —
    the cleanup a crashed maintenance op left behind. Needs no commit:
    reads exclude these files by exact name already, so removal is pure
    garbage collection and idempotent. A batch dir is removed only when
    no parquet remains in it (a checkpoint-reset batch may have reused a
    fenced dir NAME with fresh uuid-named files — those stay). Legacy
    bare-dir entries (mtime-guarded) are left for compaction."""
    import os  # noqa: PLC0415

    from .statestore import FOLDED_MARKER  # noqa: PLC0415

    if base is None:
        return
    marker = os.path.join(base, FOLDED_MARKER)
    if not fs.exists(marker):
        return
    by_dir, flat, _legacy = _parse_fence(set(fs.read(marker).splitlines()))
    for d, names in by_dir.items():
        full = os.path.join(path, d)
        if not fs.isdir(full):
            continue
        for f in fs.walk_files(full):
            if os.path.basename(f) in names:
                fs.remove(f)
        if not fs.walk_files(full):
            fs.rmtree(full)
    for n in flat:
        full = os.path.join(path, n)
        if fs.exists(full):
            fs.remove(full)


def _commit_state_rewrite(
    df: DataFrame,
    committer,
    path: str,
    basis,
    *,
    spark=None,
    key: str | None = None,
    carry: list[str] | None = None,
    carried_stats: dict | None = None,
) -> None:
    """Publish a full rewrite of a committer-managed state store: stage a
    version dir, write, ONE atomic pointer commit, then remove the now-
    superseded appends (``batch_id=*`` dirs) and flat files — every row
    they held was folded into the new base, so post-commit they are pure
    duplicates. ``basis`` (capture it with ``committer.current_version``
    BEFORE reading the data being rewritten) makes the pointer commit a
    compare-and-swap — a concurrent commit raises ``CommitConflict``
    instead of being silently overwritten.

    The staged version carries a ``_FOLDED`` marker listing the appends it
    folded (see :func:`_write_folded_marker`), published atomically WITH
    the base by the pointer commit — so a crash between the commit and the
    cleanup leaves the stale appends on disk but READS already exclude
    them: rows a rewrite removed (retraction!) cannot transiently
    resurface from a superseded append. Re-running the op (idempotent) or
    the next compaction removes the garbage directories.

    **Pruned rewrites** (``carry``/``carried_stats`` from
    :func:`_prune_plan`): ``df`` then holds only the TOUCHED files'
    surviving rows, and the untouched files are published by reference —
    a ``_CARRY`` marker in the staged version lists their store-relative
    ORIGINAL locations, readers resolve base ∪ carried, and GC protects
    every referenced version dir
    (:meth:`...sinks.committer.ManifestCommitter._carry_refs`) — so a
    retraction hitting 3 of 10⁵ files commits in O(touched), not
    O(store). With ``spark`` + ``key`` set, the staged files' per-file
    ``[min, max]`` pruning stats are computed (one tiny aggregation over
    just-written, cache-hot data) and published atomically with the base
    (carried files keep their prior entries), so the NEXT maintenance op
    prunes from one small JSON object instead of 10⁵ parquet footers."""
    import os  # noqa: PLC0415

    fs = committer.fs
    folded = []
    if fs.isdir(path):
        folded = [
            n
            for n in fs.listdir(path)
            if (n.startswith("batch_id=") and fs.isdir(os.path.join(path, n)))
            or n.endswith(".parquet")
        ]
    tmp = committer.stage(path)
    df.write.mode("overwrite").parquet(fs.spark_path(tmp))
    if spark is not None and key is not None:
        stats = _collect_version_stats(spark, fs, tmp, key)
        if stats is not None:
            stats.update(carried_stats or {})
            _write_prune_stats(fs, tmp, key, stats)
    if carry:
        from .statestore import CARRY_MARKER  # noqa: PLC0415

        fs.put(os.path.join(tmp, CARRY_MARKER), "\n".join(sorted(carry)))
    _write_folded_marker(fs, tmp, _fold_file_entries(fs, path, folded))
    committer.commit(tmp, path, expected_basis=basis)
    for n in folded:
        full = os.path.join(path, n)
        if fs.isdir(full):
            fs.rmtree(full)
        elif fs.exists(full):
            fs.remove(full)


def retract_from_state(spark, state_dir: str, ids: list, committer=None) -> None:
    """Remove documents from every derived curation store — the
    right-to-be-forgotten path for a training-data pipeline: a deletion in
    the source corpus must propagate to the hash store, the signature store,
    and the verification corpus, or the deleted text keeps influencing
    future dedup decisions.

    Signatures and corpus rows are dropped by id (anti-join rewrite).
    Content hashes are SHARED — if a surviving doc carries the same text,
    its hash must stay — so the hash store drops exactly the retracted
    docs' hashes that no remaining doc still produces (computed before
    the corpus rewrite, while the retracted text is still readable);
    without pruning stats it is instead rebuilt from the remaining
    corpus, which additionally repairs any drift.

    **O(touched) at scale.** On the versioned backend, each store's
    rewrite is PRUNED through the base version's ``_PRUNE_STATS``
    (per-file ``[min, max]`` of the store key, published atomically with
    every maintenance commit): files whose range misses every retracted
    id are published by reference via a ``_CARRY`` marker instead of
    being rewritten (see :func:`_prune_plan` /
    :func:`_commit_state_rewrite`), so retracting 3 documents from a
    10⁵-file store reads and writes 3 files plus the un-compacted
    appends, not the whole store. A store without stats yet (bootstrap,
    pre-stats versions) falls back to the full rewrite — which itself
    publishes stats, making the next retraction pruned. The hash
    liveness check still scans the remaining corpus once (read-only, no
    shuffle beyond a broadcast-filtered distinct); only rewrites are
    O(touched).

    Without a ``committer`` the rewrite swaps via two renames (quiesce
    readers first, see :func:`_swap_dir`). With a versioned ``committer``
    the rewrite publishes through one atomic pointer write — a concurrent
    reader sees the pre- or post-retraction store, never a missing one.
    The superseded ``batch_id=*`` appends are removed after the commit,
    but the commit itself already fences them: the new base's ``_FOLDED``
    marker (published atomically with it) makes reads exclude them, so a
    crash before the cleanup leaves garbage directories, never resurfaced
    retracted ids. Retraction must not run concurrently with ingest (it
    folds the replayable batch). On ANY failure re-run the retraction
    (idempotent): stores are rewritten one at a time — HASHES first (the
    drop-set needs the retracted docs' text, which only the pre-rewrite
    corpus holds; once the corpus commit lands, a re-run can no longer
    derive it), then corpus, then sigs — so a crash can leave later
    stores not yet retracted; compaction only sweeps the fenced garbage
    of stores whose rewrite committed, it does not retract the rest.
    Each store's pointer commit
    is a compare-and-swap against the version this retraction read: a
    concurrent commit raises
    :class:`...sinks.committer.CommitConflict` — re-run against the new
    state rather than silently overwriting it.
    """
    import uuid  # noqa: PLC0415

    from pyspark.sql.types import StructType  # noqa: PLC0415

    from .statestore import list_store_files, read_store  # noqa: PLC0415

    versioned = committer is not None and committer.versioned
    fs = committer.fs if versioned else None
    corpus_path = f"{state_dir}/corpus"
    sigs_path = f"{state_dir}/sigs"
    hash_path = f"{state_dir}/hashes"

    # CAS bases, captured BEFORE each store is read: a concurrent commit
    # on any of them turns this retraction's commit into a CommitConflict
    # instead of a silent lost update
    basis_c = committer.current_version(corpus_path) if versioned else None
    plan_c = None
    if versioned:
        corpus_files = list_store_files(spark, corpus_path, None, committer)
        if not corpus_files:
            return
        corpus_all = spark.read.parquet(
            *[fs.spark_path(f) for f in corpus_files]
        )
        plan_c = _prune_plan(
            fs,
            corpus_path,
            committer.resolve(corpus_path, basis_c),
            corpus_files,
            ids,
        )
    else:
        corpus_all = read_store(spark, corpus_path, committer=committer)
        if corpus_all is None:
            return
    # Schema of the id list follows the store's id column (bigint ids and
    # string ids both occur; a hardcoded type would silently anti-join
    # nothing on the other kind).
    id_field = corpus_all.schema["id"]
    from ..localframe import local_df as _ldf  # noqa: PLC0415

    ids_df = _ldf(spark, [(i,) for i in ids], StructType([id_field]))

    def _anti(df: DataFrame) -> DataFrame:
        return df.join(F.broadcast(ids_df), "id", "left_anti")

    def _pruned_commit(path, basis, plan, key, transform) -> None:
        """One store's pruned rewrite: read only the touched files, apply
        the retraction ``transform``, publish with the untouched files
        carried by reference. When NOTHING needs rewriting, skip the
        commit entirely (no version churn) and just sweep any fenced
        garbage a crashed prior run left behind."""
        rewrite, carry, cstats = plan
        if not rewrite:
            _sweep_fenced_garbage(fs, path, committer.resolve(path, basis))
            return
        df = transform(
            spark.read.parquet(*[fs.spark_path(f) for f in rewrite])
        )
        _commit_state_rewrite(
            df,
            committer,
            path,
            basis,
            spark=spark,
            key=key,
            carry=carry,
            carried_stats=cstats,
        )

    # ---- hash store FIRST: dropping a hash needs the retracted doc's
    # TEXT, which only the pre-rewrite corpus holds. Hash-first makes
    # every crash point re-runnable: if the corpus commit (or anything
    # after it) fails, the hash store is already correct, and the re-run
    # finds no corpus rows for the ids and leaves it alone; if the hash
    # commit itself fails, nothing has changed and the re-run starts over.
    basis_h = committer.current_version(hash_path) if versioned else None
    pruned_h = versioned and (
        _read_prune_stats(fs, committer.resolve(hash_path, basis_h))
        is not None
    )
    if pruned_h:
        # candidate dead hashes — the retracted docs' content hashes. The
        # read is itself pruned: a retracted row can only live in a file
        # whose id range hits the list (touched files + appends).
        hr_src = corpus_all
        if plan_c is not None:
            hr_src = (
                spark.read.parquet(*[fs.spark_path(f) for f in plan_c[0]])
                if plan_c[0]
                else None
            )
        doomed = (
            []
            if hr_src is None
            else sorted(
                r["h"]
                for r in hr_src.join(F.broadcast(ids_df), "id", "left_semi")
                .select(F.md5("text").alias("h"))
                .distinct()
                .collect()
            )
        )
        if doomed:
            # liveness probe: ONE read-only corpus scan semi-joined to the
            # candidate set — a hash stays if any surviving doc produces
            # it. Broadcast join, not isin(): a mass retraction's
            # candidate list must not become a giant codegen expression.
            doomed_df = _ldf(spark, [(h,) for h in doomed], "h string")
            still = {
                r["h"]
                for r in _anti(corpus_all)
                .select(F.md5("text").alias("h"))
                .join(F.broadcast(doomed_df), "h", "left_semi")
                .distinct()
                .collect()
            }
            drop = sorted(set(doomed) - still)
            if drop:
                hash_files = list_store_files(
                    spark, hash_path, None, committer
                )
                plan_h = (
                    _prune_plan(
                        fs,
                        hash_path,
                        committer.resolve(hash_path, basis_h),
                        hash_files,
                        drop,
                    )
                    if hash_files
                    else None
                )
                if plan_h is not None:
                    drop_df = _ldf(spark, [(h,) for h in drop], "h string")
                    _pruned_commit(
                        hash_path,
                        basis_h,
                        plan_h,
                        "h",
                        lambda df: df.join(
                            F.broadcast(drop_df), "h", "left_anti"
                        ),
                    )
                else:
                    # the stats raced away between the peek and the plan
                    # (concurrent commit): full rebuild below, CAS-guarded
                    pruned_h = False
    if not pruned_h:
        # full rebuild from the corpus-as-retracted: also repairs drift,
        # and publishes stats so the NEXT retraction prunes
        hashes = _anti(corpus_all).select(
            F.md5(F.col("text")).alias("h")
        ).distinct()
        if versioned:
            _commit_state_rewrite(
                hashes, committer, hash_path, basis_h, spark=spark, key="h"
            )
        else:
            tmp_h = f"{hash_path}__tmp_{uuid.uuid4().hex}"
            hashes.write.mode("overwrite").parquet(tmp_h)
            _swap_dir(tmp_h, hash_path)

    # ---- corpus ----
    if versioned and plan_c is not None:
        _pruned_commit(corpus_path, basis_c, plan_c, "id", _anti)
    elif versioned:
        _commit_state_rewrite(
            _anti(corpus_all), committer, corpus_path, basis_c,
            spark=spark, key="id",
        )
    else:
        tmp_c = f"{corpus_path}__tmp_{uuid.uuid4().hex}"
        _anti(corpus_all).write.mode("overwrite").parquet(tmp_c)
        _swap_dir(tmp_c, corpus_path)

    # ---- sigs ----
    basis_s = committer.current_version(sigs_path) if versioned else None
    if versioned:
        sig_files = list_store_files(spark, sigs_path, None, committer)
        if sig_files:
            plan_s = _prune_plan(
                fs,
                sigs_path,
                committer.resolve(sigs_path, basis_s),
                sig_files,
                ids,
            )
            if plan_s is not None:
                _pruned_commit(sigs_path, basis_s, plan_s, "id", _anti)
            else:
                sigs = _anti(
                    spark.read.parquet(*[fs.spark_path(f) for f in sig_files])
                )
                _commit_state_rewrite(
                    sigs, committer, sigs_path, basis_s, spark=spark, key="id"
                )
    else:
        sigs_all = read_store(spark, sigs_path, committer=committer)
        if sigs_all is not None:
            tmp_s = f"{sigs_path}__tmp_{uuid.uuid4().hex}"
            _anti(sigs_all).write.mode("overwrite").parquet(tmp_s)
            _swap_dir(tmp_s, sigs_path)
