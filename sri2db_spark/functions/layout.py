"""Data-layout operators for training-corpus export at 100 TB scale.

A trained-on corpus is not just filtered and deduped — it has to be *laid
out*: split into deterministic shards a thousand loader workers can claim,
globally shuffled so no shard is a topical clump, and clustered on disk so
range predicates prune files instead of scanning them. These operators are
the Spark-side of that export step. All three are engineered for
replayability: no RNG, no timestamps — md5 over ids — so a re-run (or a
different engine; see ``plans/oracles.py``) produces byte-identical layouts.

Scale notes:

- ``shard_assign``/``shard_manifest`` are pure projections + one hash-agg —
  no shuffle beyond the manifest's groupBy.
- ``corpus_shuffle`` is the scale-safe global shuffle: a content-independent
  md5 priority key, a 256-way partition prefix from the key's first byte,
  and a *partitioned* row_number — no global window, no single-reducer sort.
  ``(part, pos)`` is a total order: readers consume parts 0..255 in order.
- ``zorder_key`` interleaves the bits of min-max-bucketed dimensions
  (the Z-order space-filling curve used by lakehouse OPTIMIZE ZORDER BY) in
  pure int64 arithmetic, so ``repartitionByRange`` + parquet min/max footers
  give multi-column data skipping. The bucketing is integer-exact
  (``(x - min) div width``) — no float rounding to drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "append_zordered",
    "compact_zordered",
    "corpus_shuffle",
    "read_skipping",
    "retract_from_zordered",
    "shard_assign",
    "shard_manifest",
    "write_zordered",
    "zorder_key",
    "zorder_repartition",
]

#: per-file min/max stats sidecar inside a written (or committed-version)
#: directory; `_`-prefixed so Spark's parquet reader ignores it
FILE_STATS = "_FILE_STATS.json"


def _md5_bucket(col: F.Column, modulus: int) -> F.Column:
    """First 8 md5 hex digits as a long, mod ``modulus`` — the repo's standard
    engine-portable uniform hash (same construction as text.split_assign)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(modulus),
    )


def shard_assign(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Add a deterministic ``shard`` column in [0, n_shards).

    Hash-based (not ``id % n``) so sequential/clustered ids spread evenly;
    content-independent so re-curating a document never moves it between
    shards. Pure projection — no shuffle."""
    return df.withColumn("shard", _md5_bucket(F.col(id_col), n_shards))


def shard_manifest(df: DataFrame, id_col: str, n_shards: int, size_col: str | None = None) -> DataFrame:
    """Per-shard export manifest: row count, id span, and (optionally) total
    payload size — the index a loader fleet uses to claim balanced work.
    One hash-agg over the shard column."""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_size"))
    return shard_assign(df, id_col, n_shards).groupBy("shard").agg(*aggs)


def shard_export(df: DataFrame, id_col: str, n_shards: int, path: str) -> DataFrame:
    """Write ``df`` hash-sharded to ``path`` (one directory per shard, the
    layout a 1000-worker loader consumes) and return the manifest."""
    sharded = shard_assign(df, id_col, n_shards)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    return shard_manifest(df, id_col, n_shards)


def corpus_shuffle(
    df: DataFrame, id_col: str, seed: str = "0", n_parts: int = 256
) -> DataFrame:
    """Deterministic seeded global shuffle for training-order export.

    Every row gets a priority key ``md5(seed ':' id)``; its first byte picks
    one of ``n_parts`` ordered partitions and a row_number *within* the
    partition gives the position. ``(part, pos)`` read in part order is a
    uniform pseudo-random total order over the corpus — changing ``seed``
    produces an independent order; re-running reproduces it exactly.

    Scale shape: one shuffle on ``part`` + per-partition sort. No global
    window, no driver sort, no RNG state. ``n_parts`` must divide 16^k for
    prefix uniformity — use 16/256/4096.
    """
    if n_parts not in (16, 256, 4096):
        raise ValueError("n_parts must be 16, 256 or 4096 (hex-prefix uniformity)")
    prefix_len = {16: 1, 256: 2, 4096: 3}[n_parts]
    skey = F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")))
    out = df.withColumn("skey", skey).withColumn(
        "part", F.conv(F.substring(F.col("skey"), 1, prefix_len), 16, 10).cast("int")
    )
    w = Window.partitionBy("part").orderBy("skey", id_col)
    return out.withColumn("pos", F.row_number().over(w))


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "zkey"
) -> tuple[DataFrame, DataFrame]:
    """Z-order (Morton) key over 2-4 long-typed columns.

    Each column is bucketed to ``bits`` bits with integer-exact arithmetic —
    ``(x - min) div width`` where ``width = (span div 2^bits) + 1`` — then the
    bucket bits are interleaved, first column in the most-significant lane.
    Rows close in every dimension get close keys, so a
    ``repartitionByRange(zkey)`` write yields parquet files whose min/max
    footers are tight in *all* dimensions at once: a filter on any z-ordered
    column prunes most files (multi-column data skipping).

    The per-column min/max is one scalar aggregate (returned as the second
    DataFrame for manifest/reuse); bits*len(cols) must fit a signed int64.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_key interleaves 2-4 columns")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must be <= 62 (signed int64 key)")
    bounds_df = df.agg(
        *[f for c in cols for f in (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))]
    )
    b = bounds_df.collect()[0]  # 2k scalars — driver-safe at any data size

    k = len(cols)
    key = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        lo, hi = b[f"min_{c}"], b[f"max_{c}"]
        span = int(hi) - int(lo)
        if span >= (1 << bits):
            # wide dimension: integer-exact down-bucketing
            width = (span >> bits) + 1
            bucket = F.expr(f"(CAST({c} AS BIGINT) - {int(lo)}L) DIV {width}L")
        else:
            # narrow dimension: scale UP so its values occupy the high bit
            # lanes too — otherwise (e.g. a 15-value column against a
            # millisecond timestamp) the interleave degenerates to a sort on
            # the wide column alone and files stop pruning on this one.
            scale = ((1 << bits) - 1) // max(span, 1)
            bucket = F.expr(f"(CAST({c} AS BIGINT) - {int(lo)}L) * {scale}L")
        # bit j of column ci lands at position j*k + (k-1-ci)
        for j in range(bits):
            key = key + F.shiftleft(
                F.shiftright(bucket, j).bitwiseAND(F.lit(1)), j * k + (k - 1 - ci)
            )
    return df.withColumn(key_col, key.cast("long")), bounds_df


def zorder_repartition(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` range-partitions of the Z-order key —
    the write-side of OPTIMIZE ZORDER BY. Sorting within partitions keeps
    parquet row-group stats tight too. Drop ``zkey`` after writing if the
    consumer shouldn't see it."""
    keyed, _ = zorder_key(df, cols, bits=bits)
    return keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")


def _file_basename(uri: str) -> str:
    """Basename of ``input_file_name()``'s URI (strips scheme + dirs)."""
    from urllib.parse import unquote, urlparse  # noqa: PLC0415

    return unquote(urlparse(uri).path).rsplit("/", 1)[-1]


def _entry_home(path: str, old_base: str, entry: str) -> str:
    """Physical location of a committed stats entry: carried entries name
    their ORIGINAL home relative to the table root ("v_old/part-…"); the
    current version's own files are bare basenames inside its dir. The
    single resolution rule every reader and rewriter shares."""
    import os  # noqa: PLC0415

    return (
        os.path.join(path, entry)
        if "/" in entry
        else os.path.join(old_base, entry)
    )


def _carry_by_reference(
    src: dict, old_version: str, merged: dict
) -> list[str]:
    """Build the ``_CARRY`` entry list for the files in ``src``
    (entry → stats) and merge their stats into ``merged``. Chains never
    deepen: an already-carried entry keeps naming its ORIGINAL home
    verbatim; only the old base's own files gain its version prefix. The
    one convention every zordered writer (append/compact/retract) must
    agree on — shared so it cannot silently diverge."""
    carry = []
    for entry, st in src.items():
        ref = entry if "/" in entry else f"{old_version}/{entry}"
        carry.append(ref)
        merged[ref] = st
    return carry


def _raise_for_vanished_basis(committer, path: str, old_base: str, err) -> None:
    """Convert a read failure caused by the basis version dir VANISHING
    mid-staging into :class:`~...sinks.committer.CommitConflict`. A
    concurrent rewrite can supersede the basis AND drop every carry
    reference to it, at which point the committer's GC may collect the dir
    while a slower writer is still staging from it — the same stale-basis
    condition the commit-time CAS reports, just observed earlier.
    Converting it lets every retry loop (``stream_zordered_ingest``'s, a
    scheduler's) treat both uniformly: re-resolve and re-run.

    The conversion requires BOTH (a) the pointer moved past ``old_base``'s
    version and (b) evidence the failure IS the vanishing — the basis dir
    is gone, or the error is a missing-file error. A pointer that merely
    advanced (concurrent appends carry old files by reference, so the
    basis files stay live) must NOT excuse an unrelated job failure:
    retrying a deterministic error (OOM, corrupt input) against steady
    append traffic would livelock instead of surfacing. Everything else
    re-raises unchanged."""
    import os  # noqa: PLC0415

    from ..sinks.committer import CommitConflict  # noqa: PLC0415

    old_version = os.path.basename(old_base)
    cur = committer.current_version(path)
    superseded = cur is not None and cur != old_version
    base_gone = not committer.fs.isdir(old_base)
    missing_file_shaped = isinstance(err, FileNotFoundError) or any(
        marker in str(err)
        for marker in (
            "FileNotFoundException",
            "PATH_NOT_FOUND",
            "does not exist",
            "No such file",
        )
    )
    if superseded and (base_gone or missing_file_shaped):
        raise CommitConflict(path, old_version, cur) from err
    raise err


def _carry_protocol_sidecars(fs, old_base: str, target: str, markers) -> None:
    """Every new committed version of a zordered table carries the
    ``_STREAM_*`` sidecars of the version it replaces (the streaming
    ingest's replay high-water mark), unless this commit itself rewrites
    the sidecar via ``markers``. Without this, ANY non-stream writer —
    a batch ``append_zordered``, a full ``write_zordered`` re-cluster, a
    ``compact_zordered`` — would publish a version with no mark, and the
    next checkpoint-reset/restart replay would double-apply its batches."""
    import os  # noqa: PLC0415

    override = set(markers or {})
    for name in fs.listdir(old_base):
        if name.startswith("_STREAM_") and name not in override:
            fs.put(
                os.path.join(target, name),
                fs.read(os.path.join(old_base, name)),
            )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    committer=None,
    markers: dict[str, str] | None = None,
) -> dict:
    """Z-order-cluster ``df`` on ``cols``, write it, and publish per-file
    min/max stats (``_FILE_STATS.json``) alongside the data — the
    file-level data-skipping index lakehouse formats keep in their
    metadata layer.

    Parquet footers already give min/max per file, but at 100 TB a table
    is 10⁵+ files and *planning* a range scan means 10⁵ footer GETs
    against the object store before a single row is read. One stats
    object read by the driver replaces all of them:
    :func:`read_skipping` hands Spark only the files whose stat ranges
    overlap the predicate. Z-order clustering is what makes those ranges
    tight on every listed column at once.

    With a versioned ``committer`` the data and its stats are staged in
    one version directory and published by the ONE atomic pointer write —
    a reader never sees data without its stats or stats for other data.
    Returns ``{filename: {col: [min, max]}}``.
    """
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    from ..sinks.fs import LocalFS  # noqa: PLC0415

    _check_stats_cols(df, cols, "write_zordered")
    clustered = zorder_repartition(df, cols, n_files, bits=bits).drop("zkey")
    versioned = committer is not None and committer.versioned
    target = committer.stage(path) if versioned else path
    fs = committer.fs if committer is not None else LocalFS()
    clustered.write.mode("overwrite").parquet(fs.spark_path(target))
    stats = _collect_file_stats(df.sparkSession, fs.spark_path(target), cols)
    fs.put(
        os.path.join(target, FILE_STATS),
        json.dumps({"cols": cols, "files": stats}, sort_keys=True),
    )
    # extra sidecars (e.g. the streaming high-water mark) publish
    # atomically WITH the data: same pointer write, or same directory on
    # the unversioned path
    for name, data in (markers or {}).items():
        fs.put(os.path.join(target, name), data)
    if versioned:
        prev = committer.resolve(path)
        if prev is not None:
            try:
                _carry_protocol_sidecars(fs, prev, target, markers)
            except FileNotFoundError as e:
                # prev superseded+collected between resolve and the copy —
                # same stale-basis race as append/compact/retract
                _raise_for_vanished_basis(committer, path, prev, e)
        # this rewrite resolved prev (and carried its _STREAM_* replay
        # marks), so the pointer write must be a compare-and-swap like
        # append/compact/retract: a stream batch committing between
        # resolve() and commit() would otherwise be silently clobbered —
        # its data AND its high-water mark both lost. expected_basis=None
        # ("nothing committed yet") covers the first-publication race the
        # same way: a concurrent first commit wins and this one conflicts.
        committer.commit(
            target,
            path,
            expected_basis=None if prev is None else os.path.basename(prev),
        )
    return stats


def _check_stats_cols(df: DataFrame, cols: list[str], fname: str) -> None:
    """Validate BEFORE any destructive write: stats min/max must be
    JSON-serializable and comparable to the plain numbers/strings
    read_skipping's ranges carry — timestamp/date/decimal/binary columns
    would either crash json.dumps after the data was already replaced or
    compare inconsistently at read time."""
    allowed = {"byte", "short", "int", "bigint", "float", "double", "string"}
    for c, t in df.select(cols).dtypes:
        if t not in allowed:
            raise TypeError(
                f"{fname} stats column {c!r} has type {t}; cast it "
                "to a numeric/string first (e.g. a timestamp to epoch ms: "
                f"F.expr('{c} div 1000000'))"
            )


def _collect_file_stats(spark, target: str, cols: list[str]) -> dict:
    """Per-file min/max over the just-written directory: one row per FILE
    (n_files-scale), driver-safe at any data size."""
    rows = (
        spark.read.parquet(target)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            *[
                f
                for c in cols
                for f in (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))
            ]
        )
        .collect()
    )
    return {
        _file_basename(r["file"]): {
            c: [r[f"min_{c}"], r[f"max_{c}"]] for c in cols
        }
        for r in rows
    }


def append_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    committer=None,
    markers: dict[str, str] | None = None,
) -> dict:
    """O(batch) append to a :func:`write_zordered` table: the new batch is
    Z-order-clustered and written as its OWN files; every prior file is
    published BY REFERENCE (a ``_CARRY`` list naming its original physical
    location, the §7.9 convention — so GC protects the old version dirs
    for free) and the stats object is merged to cover both. At 100 TB an
    ingest tick costs the batch, never a table rewrite; per-file ranges
    stay tight within each generation (cross-generation overlap grows with
    generations — run :func:`write_zordered` occasionally to re-cluster,
    which drops the carries and releases the old dirs). ``doctor --store``
    reports ``generations_carried`` and ``files_per_point`` (expected
    files a point predicate scans) and hints at a re-cluster once
    :data:`~.doctor.RECLUSTER_GENERATIONS` generations accumulate.

    Requires the versioned committer (the carry needs the manifest
    pointer); a path with nothing committed yet degrades to
    :func:`write_zordered`. Read through :func:`read_skipping` (it
    resolves carried files; a plain ``spark.read.parquet`` of the current
    version dir would see only the newest batch).

    Returns the merged ``{entry: {col: [min, max]}}`` stats.
    """
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    from .statestore import CARRY_MARKER  # noqa: PLC0415

    if committer is None or not committer.versioned:
        raise ValueError(
            "append_zordered publishes prior files by reference, which "
            "needs the ManifestCommitter; use write_zordered for full "
            "rewrites"
        )
    old_base = committer.resolve(path)
    if old_base is None:
        return write_zordered(
            df, path, cols, n_files, bits=bits, committer=committer,
            markers=markers,
        )
    fs = committer.fs
    try:
        old_meta = json.loads(fs.read(os.path.join(old_base, FILE_STATS)))
    except FileNotFoundError as e:
        # basis superseded-and-collected mid-read -> CommitConflict (retry
        # on the new basis); a still-current basis without stats is not a
        # zordered table at all
        try:
            _raise_for_vanished_basis(committer, path, old_base, e)
        except FileNotFoundError:
            raise ValueError(
                f"{path} has no {FILE_STATS} in its committed version — "
                "not a write_zordered table (stats-less data cannot be "
                "carried; re-cluster it once with write_zordered)"
            ) from None
    if old_meta["cols"] != cols:
        raise ValueError(
            f"append stats columns {cols} != table's {old_meta['cols']}"
        )
    _check_stats_cols(df, cols, "append_zordered")
    clustered = zorder_repartition(df, cols, n_files, bits=bits).drop("zkey")
    target = committer.stage(path)
    clustered.write.mode("overwrite").parquet(fs.spark_path(target))
    merged = _collect_file_stats(df.sparkSession, fs.spark_path(target), cols)
    old_version = os.path.basename(old_base)
    carry = _carry_by_reference(old_meta["files"], old_version, merged)
    fs.put(os.path.join(target, CARRY_MARKER), "\n".join(sorted(carry)))
    fs.put(
        os.path.join(target, FILE_STATS),
        json.dumps({"cols": cols, "files": merged}, sort_keys=True),
    )
    for name, data in (markers or {}).items():
        fs.put(os.path.join(target, name), data)
    try:
        _carry_protocol_sidecars(fs, old_base, target, markers)
    except FileNotFoundError as e:
        _raise_for_vanished_basis(committer, path, old_base, e)
    # read-modify-write: this commit is built on old_base's stats/files,
    # so the pointer write must be a compare-and-swap — a concurrent
    # append/rewrite landing in between would otherwise be silently
    # overwritten and ITS batch would vanish from every scan
    committer.commit(target, path, expected_basis=old_version)
    return merged


def _generation_rectangles(files: dict, cols: list[str], own_gen: str) -> dict:
    """Per-generation bounding rectangle in stats space: generation =
    version-prefix of carried entries / ``own_gen`` for the current
    version's own files; rectangle = per-column [min of file mins, max of
    file maxes]. A column whose stats are missing or mixed-type for any
    file of a generation becomes a wildcard (``None`` — treated as
    overlapping everything: unknown ranges can't prune, so they can't
    justify skipping a merge)."""
    rects: dict[str, dict] = {}
    members: dict[str, list[str]] = {}
    for entry, st in files.items():
        gen = entry.split("/", 1)[0] if "/" in entry else own_gen
        members.setdefault(gen, []).append(entry)
        rect = rects.setdefault(gen, {})
        for c in cols:
            if c in rect and rect[c] is None:
                continue
            b = st.get(c)
            ok = (
                isinstance(b, list)
                and len(b) == 2
                and all(isinstance(x, (int, float)) for x in b)
            )
            if not ok:
                rect[c] = None  # wildcard
                continue
            if c in rect:
                rect[c] = [min(rect[c][0], b[0]), max(rect[c][1], b[1])]
            else:
                rect[c] = [b[0], b[1]]
    return {g: {"rect": rects[g], "entries": members[g]} for g in rects}


def _rects_overlap(a: dict, b: dict, cols: list[str]) -> bool:
    """Two generation rectangles overlap iff their ranges intersect on
    EVERY stats column (z-space rectangles); wildcards intersect all."""
    for c in cols:
        ra, rb = a.get(c), b.get(c)
        if ra is None or rb is None:
            continue
        if ra[1] < rb[0] or rb[1] < ra[0]:
            return False
    return True


def _generation_components(gens: dict, cols: list[str]) -> list[list[str]]:
    """Connected components of generations under pairwise rectangle
    overlap (union-find over the handful of live generations — doctor
    hints a re-cluster near 8, so n is small by construction)."""
    names = sorted(gens)
    parent = {g: g for g in names}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if _rects_overlap(gens[a]["rect"], gens[b]["rect"], cols):
                parent[find(a)] = find(b)
    comps: dict[str, list[str]] = {}
    for g in names:
        comps.setdefault(find(g), []).append(g)
    return list(comps.values())


def compact_zordered(
    spark,
    path: str,
    committer,
    min_depth: int = 3,
    bits: int = 16,
    n_files: int | None = None,
) -> dict:
    """Incremental re-cluster of an :func:`append_zordered` table — the
    O(overlap) answer to the doctor's re-cluster hint, so the O(table)
    :func:`write_zordered` full rewrite is needed only as a last resort.

    Each append tick adds one generation whose per-file ranges are tight
    internally but overlap prior generations, so
    :func:`read_skipping`'s files-per-point grows with the generation
    count. This merges ONLY overlapping GENERATIONS (the LSM minor-
    compaction shape — generations are the runs): from the published
    stats it computes each generation's bounding rectangle in z-column
    space, connects generations whose rectangles intersect on every
    column, and re-Z-orders the files of every connected component of
    ``min_depth``-or-more generations into the new version's own files.
    Every file of an untouched generation is carried BY REFERENCE to its
    original home (chains never deepen — same convention as
    :func:`append_zordered`, so GC keeps protecting referenced dirs).
    Intra-generation per-column overlap — the benign √n artifact of the
    z-interleave itself — never triggers a merge, and a table of
    range-disjoint generations (time-partitioned ingest) is a NO-OP:
    nothing staged, nothing committed. Write cost is O(merged bytes).

    The pointer write is a compare-and-swap on the basis version: a
    concurrent append landing mid-compaction surfaces as
    ``CommitConflict`` instead of its batch silently vanishing.

    Returns a report: ``{"merged_files", "carried_files",
    "generations_merged", "committed"}``.
    """
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    from .statestore import CARRY_MARKER  # noqa: PLC0415

    if committer is None or not committer.versioned:
        raise ValueError(
            "compact_zordered rewrites committed generations in place, "
            "which needs the ManifestCommitter"
        )
    fs = committer.fs
    old_base = committer.resolve(path)
    if old_base is None:
        raise FileNotFoundError(f"nothing committed at {path}")
    try:
        meta = json.loads(fs.read(os.path.join(old_base, FILE_STATS)))
    except FileNotFoundError as e:
        # basis superseded-and-collected mid-read: surface as a
        # CommitConflict so the caller's retry re-resolves
        _raise_for_vanished_basis(committer, path, old_base, e)
    cols, files = meta["cols"], meta["files"]
    old_version = os.path.basename(old_base)

    gens = _generation_rectangles(files, cols, old_version)
    comps = [
        c for c in _generation_components(gens, cols) if len(c) >= min_depth
    ]
    if not comps:
        return {
            "merged_files": 0,
            "carried_files": len(files),
            "generations_merged": 0,
            "committed": False,
        }
    merge_gens = {g for comp in comps for g in comp}
    merge_entries = {
        e for g in merge_gens for e in gens[g]["entries"]
    }
    carry_src = {e: files[e] for e in files if e not in merge_entries}

    target = committer.stage(path)
    try:
        # every Spark action over the basis's physical files (the eager
        # schema-inferring read, the zorder bounds collect, the staged
        # write): a concurrent rewrite + GC can delete those files
        # mid-job, which surfaces as a Spark read error — convert it to
        # the stale-basis conflict it is so retry loops re-resolve
        # instead of crashing
        df = spark.read.parquet(
            *[
                fs.spark_path(_entry_home(path, old_base, e))
                for e in merge_entries
            ]
        )
        clustered = zorder_repartition(
            df, cols, n_files or len(merge_entries), bits=bits
        ).drop("zkey")
        clustered.write.mode("overwrite").parquet(fs.spark_path(target))
        merged_stats = _collect_file_stats(spark, fs.spark_path(target), cols)
    except Exception as e:  # noqa: BLE001 - re-raised unless basis vanished
        _raise_for_vanished_basis(committer, path, old_base, e)

    carry = _carry_by_reference(carry_src, old_version, merged_stats)
    fs.put(os.path.join(target, CARRY_MARKER), "\n".join(sorted(carry)))
    fs.put(
        os.path.join(target, FILE_STATS),
        json.dumps({"cols": cols, "files": merged_stats}, sort_keys=True),
    )
    # compaction is read-invisible to every OTHER protocol living on the
    # table: _STREAM_* sidecars (the streaming ingest's replay high-water
    # mark) ride forward into the new version — dropping one would make a
    # checkpoint-reset replay double-apply its batch after a compaction
    try:
        _carry_protocol_sidecars(fs, old_base, target, None)
    except FileNotFoundError as e:
        _raise_for_vanished_basis(committer, path, old_base, e)
    committer.commit(target, path, expected_basis=old_version)
    return {
        "merged_files": len(merge_entries),
        "carried_files": len(carry_src),
        "generations_merged": len(merge_gens),
        "committed": True,
    }


def retract_from_zordered(
    spark,
    path: str,
    ids,
    id_col: str,
    committer,
    n_files: int | None = None,
) -> int:
    """Right-to-be-forgotten for a Z-ordered skipping table — the fourth
    persisted artifact a deletion request must reach (after the curation
    state, the published output, and the ANN index). Returns the number
    of rows removed.

    **O(touched files), not O(table)**, when ``id_col`` is one of the
    table's stats columns: the published per-file min/max ranges select
    the files that CAN hold a victim (driver-side, stats-object-scale —
    no data read for the pruning decision), only those are rewritten as
    the new version's own files (victims anti-joined out against the
    broadcast drop set, never a giant ``isin``), and every other file is
    carried by reference to its original home — the same `_CARRY`
    convention as :func:`append_zordered`, so untouched generations stay
    byte-identical and GC keeps protecting their dirs. When ``id_col``
    is not a stats column every file is a candidate (correct, just
    unpruned — the doctor's stats metrics tell you which columns prune).

    The commit is a CAS on the basis version (a concurrent append or
    compaction surfaces as ``CommitConflict``; re-run to retry on the
    new basis) and carries ``_STREAM_*`` sidecars forward like every
    other writer. Retract from the UPSTREAM source too: a stream replay
    or re-ingest would otherwise re-publish the documents.
    """
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    from pyspark.sql import DataFrame  # noqa: PLC0415

    from .statestore import CARRY_MARKER  # noqa: PLC0415

    if committer is None or not committer.versioned:
        raise ValueError(
            "retract_from_zordered rewrites committed files in place, "
            "which needs the ManifestCommitter"
        )
    if not isinstance(ids, DataFrame) and not ids:
        return 0
    fs = committer.fs
    old_base = committer.resolve(path)
    if old_base is None:
        raise FileNotFoundError(f"nothing committed at {path}")
    try:
        meta = json.loads(fs.read(os.path.join(old_base, FILE_STATS)))
    except FileNotFoundError as e:
        # basis superseded-and-collected mid-read: surface as a
        # CommitConflict so the caller's retry re-resolves
        _raise_for_vanished_basis(committer, path, old_base, e)
    cols, files = meta["cols"], meta["files"]
    old_version = os.path.basename(old_base)

    if isinstance(ids, DataFrame):
        drop = ids.select(F.col(ids.columns[0]).alias("__rid")).distinct()
        id_values = [r["__rid"] for r in drop.collect()]  # RTBF-sized
    else:
        id_values = list(dict.fromkeys(ids))
        from ..localframe import local_df  # noqa: PLC0415

        drop = local_df(spark, [(i,) for i in id_values], ["__rid"])

    if id_col in cols:
        # the prune compares Python-typed stat bounds to the caller's id
        # values — a TYPE mismatch (string ids against a numeric column,
        # e.g. CLI --id-type string on a bigint table) would prune every
        # file while Spark's coercing join WOULD have matched victims: a
        # silent removed=0 "success" in the RTBF audit log. Fail loudly.
        bounds = next(
            (
                st[id_col]
                for st in files.values()
                if isinstance(st.get(id_col), list) and len(st[id_col]) == 2
                and st[id_col][0] is not None
            ),
            None,
        )
        if bounds is not None:
            numeric_col = all(isinstance(x, (int, float)) for x in bounds)
            bad = [
                v
                for v in id_values
                if isinstance(v, (int, float)) is not numeric_col
            ]
            if bad:
                raise TypeError(
                    f"retract_from_zordered: id values {bad[:3]!r}... do not "
                    f"match {id_col!r}'s "
                    f"{'numeric' if numeric_col else 'string'} stats — a "
                    "type-coerced retraction would prune wrongly; pass ids "
                    "of the column's type"
                )

    def _can_hold(st: dict) -> bool:
        b = st.get(id_col)
        if isinstance(b, list) and len(b) == 2:
            if all(isinstance(x, (int, float)) for x in b):
                return any(
                    b[0] <= v <= b[1]
                    for v in id_values
                    if isinstance(v, (int, float))
                )
            if all(isinstance(x, str) for x in b):
                return any(
                    b[0] <= v <= b[1] for v in id_values if isinstance(v, str)
                )
        return True  # no usable range: must look

    touched = (
        {e for e, st in files.items() if _can_hold(st)}
        if id_col in cols
        else set(files)
    )
    if not touched:
        return 0

    # ONE materialization of the touched files (they are read for the
    # victim count, the survivor probe, AND the rewrite — without the
    # checkpoint that is three full scans of the touched set). This
    # eager checkpoint is THE Spark action that reads the basis's
    # physical files, so the stale-basis conversion must wrap it — the
    # later survivor/write jobs read the checkpoint, not the basis.
    try:
        candidates = spark.read.parquet(
            *[fs.spark_path(_entry_home(path, old_base, e)) for e in touched]
        ).localCheckpoint(eager=True)
    except Exception as e:  # noqa: BLE001 - re-raised unless basis vanished
        _raise_for_vanished_basis(committer, path, old_base, e)
    survivors = candidates.join(
        F.broadcast(drop), candidates[id_col] == F.col("__rid"), "left_anti"
    )
    n_victims = candidates.count() - survivors.count()
    if n_victims == 0:
        return 0  # ranges matched but no victim rows: touch nothing
    carry_src = {e: st for e, st in files.items() if e not in touched}
    try:
        has_survivors = bool(survivors.limit(1).count())
    except Exception as e:  # noqa: BLE001 - re-raised unless basis moved
        _raise_for_vanished_basis(committer, path, old_base, e)
    if not has_survivors and not carry_src:
        raise ValueError(
            f"retracting these ids empties the whole table {path}; a "
            "committed empty version would be unreadable (no schema) — "
            "delete the table instead"
        )
    target = committer.stage(path)
    if has_survivors:
        try:
            clustered = zorder_repartition(
                survivors, cols, n_files or len(touched), bits=16
            ).drop("zkey")
            clustered.write.mode("overwrite").parquet(fs.spark_path(target))
            merged = _collect_file_stats(spark, fs.spark_path(target), cols)
        except Exception as e:  # noqa: BLE001 - re-raised unless basis moved
            _raise_for_vanished_basis(committer, path, old_base, e)
    else:
        # every row of every touched file was a victim: the new version
        # holds only the carried files (zorder_key cannot bucket an empty
        # frame — its bounds are null); the stage dir must still exist
        # for the sidecar writes below
        fs.makedirs(target)
        merged = {}
    carry = _carry_by_reference(carry_src, old_version, merged)
    fs.put(os.path.join(target, CARRY_MARKER), "\n".join(sorted(carry)))
    fs.put(
        os.path.join(target, FILE_STATS),
        json.dumps({"cols": cols, "files": merged}, sort_keys=True),
    )
    try:
        _carry_protocol_sidecars(fs, old_base, target, None)
    except FileNotFoundError as e:
        _raise_for_vanished_basis(committer, path, old_base, e)
    committer.commit(target, path, expected_basis=old_version)
    return n_victims


def read_skipping(
    spark, path: str, ranges: dict, committer=None, version: str | None = None
) -> DataFrame:
    """Range scan over a :func:`write_zordered` directory that feeds Spark
    ONLY the files whose published min/max overlap every predicate.

    ``ranges`` maps column → ``(lo, hi)`` (either bound may be ``None``).
    The residual filter is always applied, so the result is exactly
    ``read(path).filter(...)`` — the stats only cut the file list. A
    directory without stats falls back to the full scan (correct, just
    unpruned); a file whose stats are all-``None`` for a ranged column
    holds only nulls there and is pruned (range predicates never match
    null). Stats live with the committed version when a ``committer`` is
    given, so a compaction/rewrite that republished the data republished
    its stats with it — and time travel composes for free: pass a retained
    ``version`` (e.g. from ``committer.pins(path)``) and the scan plans
    from THAT snapshot's stats over that snapshot's files.
    """
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    from ..sinks.fs import LocalFS  # noqa: PLC0415

    if version is not None and committer is None:
        raise ValueError("version requires a versioned committer")
    base = (
        committer.resolve(path, version)
        if committer is not None and committer.versioned
        else path
    )
    if base is None:
        raise FileNotFoundError(f"nothing committed at {path}")
    residual = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            residual = residual & (F.col(c) >= F.lit(lo))
        if hi is not None:
            residual = residual & (F.col(c) <= F.lit(hi))
    fs = committer.fs if committer is not None else LocalFS()
    try:
        meta = json.loads(fs.read(os.path.join(base, FILE_STATS)))
    except FileNotFoundError:
        return spark.read.parquet(fs.spark_path(base)).filter(residual)

    def _overlaps(st: dict) -> bool:
        for c, (lo, hi) in ranges.items():
            if lo is None and hi is None:
                continue  # unbounded range constrains nothing (and its
                # residual keeps null rows, so all-null files must stay)
            if c not in st:
                continue  # no stats for this column -> cannot prune on it
            fmin, fmax = st[c]
            if fmin is None or fmax is None:
                return False  # only nulls in this file's column
            if lo is not None and fmax < lo:
                return False
            if hi is not None and fmin > hi:
                return False
        return True

    names = sorted(meta["files"])
    if not names:  # stats for an empty write: nothing to prune or read
        return spark.read.parquet(fs.spark_path(base)).filter(residual)

    def _resolve(n: str) -> str:
        # append_zordered publishes prior generations by reference: a
        # carried entry names its ORIGINAL home, "v_old/part-…", relative
        # to the store root; the base's own files are bare basenames
        return fs.spark_path(
            os.path.join(path, n) if "/" in n else os.path.join(base, n)
        )

    # carried generations must still exist — GC protects referenced dirs,
    # so a missing one is corruption and silence would drop rows
    heads = {n.split("/", 1)[0] for n in names if "/" in n}
    for h in heads:
        if not fs.isdir(os.path.join(path, h)):
            raise FileNotFoundError(
                f"zordered table {path}: committed stats carry files from "
                f"{h}, which does not exist — the table is corrupt (a "
                "carried version directory was removed)"
            )
    keep = [n for n in names if _overlaps(meta["files"][n])]
    if not keep:
        # schema-preserving empty result: scan one file, match nothing
        return spark.read.parquet(_resolve(names[0])).filter(F.lit(False))
    return spark.read.parquet(*[_resolve(n) for n in keep]).filter(residual)
