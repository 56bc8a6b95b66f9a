"""Batch-token-addressed parquet state stores for incremental pipelines.

The incremental dedup/curation operators keep derived state (content
hashes, MinHash signatures, verification corpus) as append-only parquet
directories. Under ``foreachBatch`` replay — or any at-least-once batch
scheduler — a plain directory append is NOT idempotent: a batch that
crashes after its state append and is retried would (a) append its rows a
second time and, far worse, (b) *see its own first-attempt rows as prior
state*, so an exact-dedup-vs-state anti-join drops the whole batch and the
documents are lost from the output forever (they are "in state" but never
made it to the curated corpus).

The protocol here fixes both, mirroring the reference's
exactly-once-per-run merge discipline (staging tables + one transactional
merge, ``/root/reference/src/lib/client.js:869-1040``) re-expressed for an
append-only object store:

- **Writes are addressed by batch token**: each batch overwrites its own
  ``<store>/batch_id=<token>`` subdirectory, so a replay replaces the
  partial first attempt instead of duplicating it.
- **Reads exclude the current token**: state readers list files
  recursively and drop any file under the current batch's subdirectory, so
  a retry never mistakes its own half-written state for history.
- **Reads are pinned to an explicit file list**: the returned DataFrame is
  built from the file paths resolved NOW, so lazy execution after this
  batch's own state write cannot re-resolve the directory and double-count.

Directory layout is deliberately mixed-friendly: a store may contain flat
files (initial bootstrap, post-compaction) alongside ``batch_id=*``
subdirectories; readers use recursive file listing (no Hive partition
discovery), so the schema is always exactly the file schema.

**Object-store deployments** pass a versioned ``committer``
(:class:`...sinks.committer.ManifestCommitter`): the store's compacted
base then lives in a committed version directory resolved through the
manifest pointer, with ``batch_id=*`` appends alongside it — reads are
``resolve(base) ∪ batch dirs``, and maintenance (compaction, retraction)
publishes a new base with ONE atomic pointer write, so a reader mid-
maintenance sees the old state or the new state, never a missing store
(the property the plain two-rename swap cannot give an object store).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


#: marker file inside a committed state version listing the data FILES
#: (``batch_id=N/part-….parquet`` appends, bare ``part-….parquet`` root
#: flat files) whose rows it folded; `_`-prefixed so Spark's parquet
#: reader ignores it alongside the data files
FOLDED_MARKER = "_FOLDED"

#: marker file inside a committed state version listing STORE-RELATIVE
#: parquet paths (``v_<older>/part-….parquet``) from PRIOR versions whose
#: rows are part of this version's base without being rewritten — how a
#: pruned maintenance op (retraction touching 3 of 10⁵ files) publishes a
#: new base in O(touched files). Entries always name the file's original
#: physical location, so chains never deepen: a version that carries a
#: file another version already carried repeats the same entry. GC keeps
#: any version directory a retained version's carry list references
#: (:meth:`...sinks.committer.ManifestCommitter._gc`).
CARRY_MARKER = "_CARRY"

#: per-file pruning statistics inside a committed state version: JSON
#: ``{"key": <column>, "files": {<store-relative path>: [min, max]}}``
#: computed at write time (one tiny aggregation over the just-written
#: files), so the NEXT maintenance op prunes by range intersection
#: instead of opening 10⁵ parquet footers — same one-object-read design
#: as the lake's Z-order stats (``functions.layout``).
PRUNE_STATS = "_PRUNE_STATS"


def store_batch_path(path: str, token) -> str:
    """The subdirectory a batch's state write is addressed to."""
    return f"{path}/batch_id={token}"


def resolve_carried(fs, path: str, base: str) -> list[str]:
    """Absolute paths of the files ``base``'s ``_CARRY`` marker pulls in
    from prior version directories of the store at ``path``. EVERY base
    consumer (reads AND maintenance folds) must include these — a
    compaction that walked only the base directory would silently drop
    the carried rows from the store. A missing carried file fails loudly:
    GC retains referenced version dirs, so absence means the store is
    corrupt, and silently reading on would drop rows from the exact-dedup
    anti-join and let duplicates into the corpus.

    The existence probe is per referenced VERSION DIRECTORY, not per file
    — O(versions) round-trips instead of O(carried files) per read (10⁵
    carried entries must not mean 10⁵ object-store GETs at planning). A
    single file missing from a still-present dir fails just as loudly,
    at scan time, from Spark's own missing-input error."""
    carry = os.path.join(base, CARRY_MARKER)
    if not fs.exists(carry):
        return []
    rels = [rel for rel in fs.read(carry).splitlines() if rel]
    for head in {r.split("/", 1)[0] for r in rels}:
        if not fs.isdir(os.path.join(path, head)):
            raise FileNotFoundError(
                f"state store {path}: committed base {base} carries files "
                f"from {head}, which does not exist — the store is "
                "corrupt (a carried version directory was removed)"
            )
    return [os.path.join(path, rel) for rel in rels]


def _versioned_store_files(path: str, exclude_token, committer) -> list[str]:
    """File list of a committer-managed store: the committed base version
    (resolved through the manifest pointer) plus every ``batch_id=*``
    append directory except the excluded token's — and except files the
    base's ``_FOLDED`` marker records as already folded into it (a crash
    between a maintenance commit and its cleanup leaves them on disk;
    without the exclusion a retraction's removed rows would transiently
    resurface from them). Fencing is by exact FILE name (Spark part files
    are uuid-named), so a FRESH append that merely reuses a folded
    directory name (checkpoint reset restarting batch ids over a reused
    state dir) stays fully visible regardless of filesystem timestamp
    granularity. Bare-directory entries written by older markers keep
    their original mtime guard."""
    from ..sinks.committer import check_backend_layout  # noqa: PLC0415

    fs = committer.fs
    if not fs.isdir(path):
        return []
    # flat parquet at the store root without a manifest = a rename-layout
    # store being read through the manifest backend: fail loudly (a silent
    # empty read would drop the exact-dedup anti-join). Migration path:
    # compact_curation_state with the versioned committer folds the flat
    # files into the first committed version.
    check_backend_layout(path, versioned=True, fs=fs)
    files: list[str] = []
    folded: set[str] = set()
    marker_mtime = 0.0
    base = committer.resolve(path)
    if base is not None:
        files += fs.walk_files(base)
        files += resolve_carried(fs, path, base)
        marker = os.path.join(base, FOLDED_MARKER)
        if fs.exists(marker):
            folded = set(fs.read(marker).splitlines())
            marker_mtime = fs.getmtime(marker)
    legacy_dirs = {
        e for e in folded if "/" not in e and not e.endswith(".parquet")
    }
    for name in fs.listdir(path):
        if not name.startswith("batch_id="):
            continue
        if exclude_token is not None and name == f"batch_id={exclude_token}":
            continue
        sub = os.path.join(path, name)
        if not fs.isdir(sub):
            continue
        if name in legacy_dirs and fs.getmtime(sub) <= marker_mtime:
            continue  # superseded append awaiting cleanup — already in base
        files += [
            f
            for f in fs.walk_files(sub)
            if f"{name}/{os.path.basename(f)}" not in folded
        ]
    return files


def list_store_files(spark, path: str, exclude_token=None, committer=None) -> list[str]:
    """All parquet data files under ``path`` (recursively), excluding any
    under ``batch_id=<exclude_token>/``. Empty list if the store does not
    exist yet. With a versioned ``committer``, the listing resolves the
    compacted base through the manifest pointer instead (see module
    docstring)."""
    from pyspark.errors import AnalysisException  # noqa: PLC0415

    if committer is not None and committer.versioned:
        return _versioned_store_files(path, exclude_token, committer)
    if os.path.isdir(path):
        # a manifest-managed store read WITHOUT its committer would
        # recursively pick up every retained version → duplicated rows;
        # fail loudly instead (same guard as the lake sink)
        from ..sinks.committer import check_backend_layout  # noqa: PLC0415

        check_backend_layout(path, versioned=False)
    try:
        files = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(path)
            .inputFiles()
        )
    except AnalysisException:
        # nonexistent / empty store: first batch bootstraps it. ONLY the
        # path-missing/empty analysis error means "no store" — a transient
        # I/O failure must propagate: misreading it as an empty store would
        # skip the exact-dedup anti-join (duplicates enter the corpus) and
        # flip the signature-store write to overwrite (clobbering the
        # accumulated store with one batch's rows).
        return []
    if exclude_token is not None:
        seg = f"/batch_id={exclude_token}/"
        files = [f for f in files if seg not in f]
    return files


def read_store(spark, path: str, exclude_token=None, committer=None) -> DataFrame | None:
    """Pinned-file-list read of a state store, or ``None`` when the store
    has no (other-batch) data yet. See module docstring for why the file
    list is resolved eagerly and the current token excluded."""
    files = list_store_files(spark, path, exclude_token, committer)
    if not files:
        return None
    if committer is not None and committer.versioned:
        # driver-side listing works in the fs backend's key space; Spark
        # needs the scheme-qualified form (s3a://… on an object store)
        files = [committer.fs.spark_path(f) for f in files]
    return spark.read.parquet(*files)


def write_store_batch(df: DataFrame, path: str, token, fs=None) -> None:
    """Idempotent state append: overwrite this batch's own subdirectory.
    ``fs``: the store's filesystem binding — qualifies the write path for
    Spark (``s3a://…``) on object-store deployments; default local."""
    target = store_batch_path(path, token)
    df.write.mode("overwrite").parquet(
        fs.spark_path(target) if fs is not None else target
    )
