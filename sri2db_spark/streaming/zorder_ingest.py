"""Streaming ingest into a Z-ordered data-skipping table.

``readStream`` micro-batches land as :func:`~..functions.layout.append_zordered`
generations: each tick costs O(batch), prior generations are carried by
reference, and :func:`~..functions.layout.read_skipping` serves range scans
across everything the stream has ever committed. The doctor's
``generations_carried`` / ``files_per_point`` counters and
``zorder-compact`` (LSM minor compaction) keep the accumulating
generations in check WITHOUT stopping the stream — compaction CASes
against a concurrent append and the loser retries.

Exactly-once under foreachBatch replay: the committed version carries a
``_STREAM_BATCH`` high-water-mark sidecar published by the SAME atomic
pointer write as the data, so "was this batch applied?" and "is this data
visible?" can never disagree:

- crash before the pointer write → the staged version is unreferenced
  garbage (GC sweeps it), the mark is unchanged, the replay re-appends;
- crash after the pointer write but before the checkpoint advances → the
  replay reads its own batch id at-or-under the mark and SKIPS;
- a checkpoint reset (fresh checkpoint dir restarts batch ids at 0) is the
  one case the mark cannot distinguish from replay — documented: reset the
  TABLE with the checkpoint, or point the stream at a fresh table.

:func:`~..functions.layout.compact_zordered` carries ``_STREAM_*``
sidecars into its merged version, so compaction never resets the mark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: sidecar in the committed version holding the last applied streaming
#: batch id — `_`-prefixed so Spark's parquet reader ignores it
STREAM_HWM = "_STREAM_BATCH"


def stream_zordered_ingest(
    stream: DataFrame,
    path: str,
    cols: list[str],
    checkpoint_dir: str,
    committer,
    n_files: int = 2,
    bits: int = 16,
    trigger_available_now: bool = True,
    max_commit_retries: int = 5,
    stream_id: str | None = None,
    inherit_legacy_mark: bool = False,
):
    """Start a stream writing ``stream``'s micro-batches into the
    Z-ordered table at ``path`` (see module docstring for the
    exactly-once contract). ``committer`` must be the versioned
    ManifestCommitter — the high-water mark rides the atomic pointer
    write. ``n_files`` is per-batch; size it so batch files match the
    base generation's (the doctor's ``files_per_point`` flags drift).

    ``stream_id`` namespaces the high-water mark
    (``_STREAM_BATCH.<id>``): REQUIRED when more than one stream feeds
    the same table — their foreachBatch ids are independent counters, so
    sharing one mark would make stream A's batch N look already-applied
    to stream B and silently drop B's data. The CAS append already
    serializes concurrent writers; distinct marks make their replay
    bookkeeping independent too (every writer carries all ``_STREAM_*``
    sidecars forward).

    Migration (``inherit_legacy_mark``): a pre-existing table written by
    an UNsuffixed stream holds a legacy ``_STREAM_BATCH`` mark. Whether a
    suffixed stream may read it as its own high-water mark is ambiguous —
    for the single-stream-gains-an-id rename it is exactly the right
    continuation, but for a BRAND-NEW stream pointed at that table it
    would silently skip the new stream's first N batches (data loss). So
    inheritance is opt-in: pass ``inherit_legacy_mark=True`` only when
    this suffixed stream IS the renamed legacy stream (and keep its
    checkpoint dir). With the default ``False``, finding a live
    (non-tombstone) legacy mark and no suffixed one raises instead of
    guessing. Running marked and UNmarked streams against one table
    simultaneously remains unsupported (the unmarked one would read the
    stale legacy mark and skip live batches).

    A ``CommitConflict`` mid-append (a concurrent ``zorder-compact``
    landed first) re-resolves and retries on the new basis up to
    ``max_commit_retries`` times — appends and compactions are
    commutative (the append's generation is carried by whatever version
    won), so the retry is safe, and an exhausted retry budget raises into
    the stream (at-least-once would silently become at-most-once if we
    swallowed it)."""
    import os  # noqa: PLC0415

    from ..functions.layout import append_zordered  # noqa: PLC0415
    from ..sinks.committer import CommitConflict  # noqa: PLC0415

    if committer is None or not committer.versioned:
        raise ValueError(
            "stream_zordered_ingest needs the versioned ManifestCommitter: "
            "the replay high-water mark must publish atomically with the "
            "data (one pointer write)"
        )
    if max_commit_retries < 1:
        raise ValueError(
            "max_commit_retries must be >= 1: the first append IS the "
            "first try (0 would silently apply no batch at all)"
        )
    if stream_id is not None and (
        not stream_id or not all(c.isalnum() or c in "._-" for c in stream_id)
    ):
        # a '/' would nest the sidecar under a subpath that listdir-based
        # sidecar carry never sees — the mark silently vanishes at the
        # next commit and replay duplicates; reject loudly instead
        raise ValueError(
            f"stream_id {stream_id!r} must be non-empty [A-Za-z0-9._-]: the "
            "mark is a top-level sidecar file name in the version dir"
        )
    if inherit_legacy_mark and stream_id is None:
        raise ValueError(
            "inherit_legacy_mark only applies to a suffixed stream "
            "(stream_id=...): an unsuffixed stream reads the legacy mark "
            "as its own already"
        )
    fs = committer.fs
    mark_name = STREAM_HWM if stream_id is None else f"{STREAM_HWM}.{stream_id}"

    def _applied_hwm() -> int | None:
        base = committer.resolve(path)
        if base is None:
            return None
        mark = os.path.join(base, mark_name)
        if fs.exists(mark):
            return int(fs.read(mark).strip())
        if stream_id is None:
            return None
        # suffixed mark absent but a legacy unsuffixed one exists: only the
        # renamed-legacy-stream may inherit it (opt-in). A brand-new
        # suffixed stream inheriting it would silently skip its first N
        # batches — raise instead of guessing (ADVICE r8).
        legacy = os.path.join(base, STREAM_HWM)
        if fs.exists(legacy):
            val = fs.read(legacy).strip()
            if val == "-1":
                return None  # tombstone left by a completed migration
            if inherit_legacy_mark:
                return int(val)
            raise ValueError(
                f"table {path!r} carries a live legacy _STREAM_BATCH mark "
                f"({val}) and no {mark_name}: if this stream is the renamed "
                "legacy stream pass inherit_legacy_mark=True to continue "
                "exactly-once; if it is a new stream, migrate the legacy "
                "stream first (its next commit tombstones the legacy mark)"
            )
        return None

    def _markers(batch_id: int) -> dict[str, str]:
        out = {mark_name: str(batch_id)}
        if stream_id is not None:
            # tombstone the legacy unsuffixed mark ("-1" never skips a
            # batch): once any suffixed stream has committed, a LATER
            # suffixed stream's legacy fallback must not mistake the
            # migrated stream's old mark for its own and skip its first
            # batches. (Migrating two new stream_ids onto a legacy table
            # SIMULTANEOUSLY is unsupported — the second may read the
            # first's pre-migration mark; migrate one, then add others.)
            out[STREAM_HWM] = "-1"
        return out

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        hwm = _applied_hwm()
        if hwm is not None and batch_id <= hwm:
            return  # replayed batch: its data is already committed
        last_err: Exception | None = None
        for _ in range(max_commit_retries):
            try:
                append_zordered(
                    batch_df,
                    path,
                    cols,
                    n_files,
                    bits=bits,
                    committer=committer,
                    markers=_markers(batch_id),
                )
                return
            except CommitConflict as e:  # a compaction won the CAS
                last_err = e
                hwm = _applied_hwm()
                if hwm is not None and batch_id <= hwm:
                    return  # our own earlier attempt actually landed
        raise last_err  # exhausted: surface to the stream, replay retries

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
