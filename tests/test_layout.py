"""Behavioral tests for the training-export data-layout operators
(functions/layout.py): hash sharding + manifests, seeded deterministic
corpus shuffle, and Z-order clustering with real file-level data skipping."""

from __future__ import annotations

import contextlib
import io
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from sri2db_spark.functions.layout import (
    corpus_shuffle,
    shard_assign,
    shard_export,
    shard_manifest,
    zorder_key,
    zorder_repartition,
)
from sri2db_spark.plans.analytics import _t

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- sharding


def test_shard_assign_range_and_balance(spark):
    docs = _t(spark, SF, "documents")
    n = docs.count()
    stats = (
        shard_assign(docs, "doc_id", 16)
        .groupBy("shard")
        .count()
        .collect()
    )
    assert sorted(r["shard"] for r in stats) == list(range(16))
    # md5-uniform: no shard more than 3x the even share on ~600 docs
    assert max(r["count"] for r in stats) <= 3 * (n / 16)


def test_shard_assign_is_projection_no_shuffle(spark):
    plan = plan_of(shard_assign(_t(spark, SF, "documents"), "doc_id", 16))
    assert "Exchange" not in plan


def test_shard_export_layout_and_manifest(spark):
    docs = _t(spark, SF, "documents")
    with tempfile.TemporaryDirectory(prefix="shards_") as tmp:
        path = os.path.join(tmp, "out")
        manifest = shard_export(docs, "doc_id", 8, path)
        dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
        assert dirs == [f"shard={i}" for i in range(8)]
        rows = {r["shard"]: r for r in manifest.collect()}
        assert sum(r["n_rows"] for r in rows.values()) == docs.count()
        # written files agree with the manifest, shard by shard
        back = spark.read.parquet(path).groupBy("shard").count().collect()
        for r in back:
            assert rows[r["shard"]]["n_rows"] == r["count"]


def test_shard_manifest_total_size(spark):
    docs = _t(spark, SF, "documents")
    m = shard_manifest(docs, "doc_id", 4, size_col="n_chars")
    total = m.agg(F.sum("total_size")).collect()[0][0]
    assert total == docs.agg(F.sum("n_chars")).collect()[0][0]


# ---------------------------------------------------------------- shuffle


def test_corpus_shuffle_total_order_and_determinism(spark):
    docs = _t(spark, SF, "documents").select("doc_id")
    n = docs.count()
    out = corpus_shuffle(docs, "doc_id", seed="7", n_parts=16)
    rows = out.collect()
    assert len(rows) == n
    # pos is 1..count within every part (contiguous, no gaps/dupes)
    per_part = {}
    for r in rows:
        per_part.setdefault(r["part"], []).append(r["pos"])
    for positions in per_part.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # replay-identical
    again = corpus_shuffle(docs, "doc_id", seed="7", n_parts=16).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a different seed produces a genuinely different order
    other = corpus_shuffle(docs, "doc_id", seed="8", n_parts=16)
    moved = (
        out.alias("a")
        .join(other.alias("b"), "doc_id")
        .filter((F.col("a.part") != F.col("b.part")) | (F.col("a.pos") != F.col("b.pos")))
        .count()
    )
    assert moved > n * 0.8


def test_corpus_shuffle_order_is_uniform_not_id_order(spark):
    """Reading parts in order must interleave ids, not replay insertion
    order: adjacent positions in the global order should rarely be adjacent
    doc_ids."""
    docs = _t(spark, SF, "documents").select("doc_id")
    rows = corpus_shuffle(docs, "doc_id", seed="42", n_parts=16).collect()
    ordered = [r["doc_id"] for r in sorted(rows, key=lambda r: (r["part"], r["pos"]))]
    adjacent = sum(1 for a, b in zip(ordered, ordered[1:]) if abs(a - b) == 1)
    assert adjacent < len(ordered) * 0.05


def test_corpus_shuffle_has_no_global_window(spark):
    """The window must be partitioned by the hex prefix — a global
    row_number would serialize 100 TB through one task."""
    docs = _t(spark, SF, "documents").select("doc_id")
    plan = plan_of(corpus_shuffle(docs, "doc_id", seed="1", n_parts=256))
    assert "SinglePartition" not in plan


def test_corpus_shuffle_rejects_non_hex_parts(spark):
    docs = _t(spark, SF, "documents").select("doc_id")
    with pytest.raises(ValueError):
        corpus_shuffle(docs, "doc_id", n_parts=100)


# ---------------------------------------------------------------- z-order


def _py_zkey(vals, bounds, bits=16):
    """Independent Python reference for the Morton interleave."""
    k = len(vals)
    key = 0
    for ci, (x, (lo, hi)) in enumerate(zip(vals, bounds)):
        width = ((hi - lo) // (1 << bits)) + 1
        bucket = (x - lo) // width
        for j in range(bits):
            key += ((bucket >> j) & 1) << (j * k + (k - 1 - ci))
    return key


def test_zorder_key_matches_python_reference(spark):
    data = [(1, 10, 1000), (2, 500, 2), (3, 9999, 123456), (4, 10, 123456)]
    df = spark.createDataFrame(data, "id long, x long, y long")
    keyed, bounds = zorder_key(df, ["x", "y"], bits=8)
    b = bounds.collect()[0]
    ref_bounds = [(b["min_x"], b["max_x"]), (b["min_y"], b["max_y"])]
    for r in keyed.collect():
        assert r["zkey"] == _py_zkey([r["x"], r["y"]], ref_bounds, bits=8)


def test_zorder_key_three_columns_and_validation(spark):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 7 % 50).alias("a"),
        (F.col("id") * 13 % 31).alias("b"),
        (F.col("id") * 3 % 17).alias("c"),
    )
    keyed, _ = zorder_key(df, ["a", "b", "c"], bits=10)
    assert keyed.select("zkey").distinct().count() > 1
    with pytest.raises(ValueError):
        zorder_key(df, ["a"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=40)  # 80 bits > int64


def test_zorder_write_skips_files_on_both_dimensions(spark):
    """The point of Z-order: after clustering on (user_id, ts), per-file
    min/max spans of BOTH columns are far tighter than the global span, so
    a predicate on either column prunes most files."""
    ev = _t(spark, SF, "events").select("event_id", "user_id", "ts")
    n_files = 8
    with tempfile.TemporaryDirectory(prefix="zorder_") as tmp:
        path = os.path.join(tmp, "ev")
        zorder_repartition(ev, ["user_id", "ts"], n_files).write.mode(
            "overwrite"
        ).parquet(path)
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("user_id") - F.min("user_id")).alias("uspan"),
                (F.max("ts") - F.min("ts")).alias("tspan"),
            )
            .collect()
        )
        g = ev.agg(
            (F.max("user_id") - F.min("user_id")).alias("uspan"),
            (F.max("ts") - F.min("ts")).alias("tspan"),
        ).collect()[0]
        assert len(per_file) >= n_files // 2
        avg_u = sum(r["uspan"] for r in per_file) / len(per_file)
        avg_t = sum(r["tspan"] for r in per_file) / len(per_file)
        # Z-order trades per-dimension tightness across dimensions; on 2 dims
        # each file should still cover well under the full span of each.
        assert avg_u < g["uspan"] * 0.7
        assert avg_t < g["tspan"] * 0.7


# ---------------------------------------------------------------------------
# file-level data skipping (write_zordered / read_skipping)


def _events_ms(spark):
    return _t(spark, SF, "events").select(
        "event_id", "user_id", F.expr("ts div 1000000").alias("ts_ms")
    )


def test_read_skipping_matches_full_filtered_scan(spark):
    """Stats pruning only changes which files are OPENED — row-for-row the
    result equals a plain filtered scan of everything."""
    from sri2db_spark.functions.layout import read_skipping, write_zordered

    ev = _events_ms(spark)
    ranges = {"user_id": (3, 9), "ts_ms": (1704500000000, 1705800000000)}
    with tempfile.TemporaryDirectory(prefix="zskip_") as tmp:
        path = os.path.join(tmp, "ev")
        write_zordered(ev, path, ["user_id", "ts_ms"], n_files=8)
        got = {
            tuple(r)
            for r in read_skipping(spark, path, ranges)
            .select("event_id", "user_id", "ts_ms")
            .collect()
        }
    want = {
        tuple(r)
        for r in ev.filter(
            F.col("user_id").between(3, 9)
            & F.col("ts_ms").between(1704500000000, 1705800000000)
        ).collect()
    }
    assert got == want and got


def test_read_skipping_actually_prunes_files(spark):
    """The scale contract: a narrow 2-D range over a Z-ordered write must
    hand Spark a strict subset of the files (inputFiles), and an
    out-of-range predicate must scan at most one (schema-keeper) file."""
    from sri2db_spark.functions.layout import read_skipping, write_zordered

    ev = _events_ms(spark)
    with tempfile.TemporaryDirectory(prefix="zprune_") as tmp:
        path = os.path.join(tmp, "ev")
        stats = write_zordered(ev, path, ["user_id", "ts_ms"], n_files=8)
        n_total = len(stats)
        assert n_total >= 4  # the clustering really produced several files
        narrow = read_skipping(
            spark, path, {"user_id": (0, 2), "ts_ms": (1704500000000, 1704600000000)}
        )
        assert 0 < len(narrow.inputFiles()) < n_total
        # degenerate range below every file's min: zero data files needed
        nothing = read_skipping(spark, path, {"user_id": (-100, -50)})
        assert len(nothing.inputFiles()) <= 1  # schema-keeper only
        assert nothing.count() == 0
        assert nothing.columns == narrow.columns


def test_read_skipping_without_stats_falls_back_to_full_scan(spark):
    from sri2db_spark.functions.layout import read_skipping

    ev = _events_ms(spark)
    with tempfile.TemporaryDirectory(prefix="znostat_") as tmp:
        path = os.path.join(tmp, "ev")
        ev.write.mode("overwrite").parquet(path)  # no stats sidecar
        got = read_skipping(spark, path, {"user_id": (3, 5)})
        assert got.count() == ev.filter(F.col("user_id").between(3, 5)).count()


def test_write_zordered_publishes_stats_atomically_with_committer(spark, tmp_path):
    """On the manifest backend, data + stats are one committed version: a
    reader resolves both together, and a rewrite supersedes both together."""
    from sri2db_spark.functions.layout import (
        FILE_STATS,
        read_skipping,
        write_zordered,
    )
    from sri2db_spark.sinks.committer import ManifestCommitter

    mc = ManifestCommitter()
    ev = _events_ms(spark)
    path = str(tmp_path / "zv")
    write_zordered(ev, path, ["user_id", "ts_ms"], n_files=4, committer=mc)
    phys = mc.resolve(path)
    assert os.path.exists(os.path.join(phys, FILE_STATS))
    ranges = {"user_id": (3, 9), "ts_ms": (1704500000000, 1705800000000)}
    got = read_skipping(spark, path, ranges, committer=mc)
    want = ev.filter(
        F.col("user_id").between(3, 9)
        & F.col("ts_ms").between(1704500000000, 1705800000000)
    )
    assert got.count() == want.count() > 0
    # rewrite with HALF the data: new version's stats rule the read
    write_zordered(
        ev.filter(F.col("user_id") < 5), path,
        ["user_id", "ts_ms"], n_files=4, committer=mc,
    )
    got2 = read_skipping(spark, path, {"user_id": (0, 100)}, committer=mc)
    assert got2.count() == ev.filter(F.col("user_id") < 5).count()


def test_write_zordered_rejects_unserializable_types_before_writing(spark):
    """A timestamp/decimal cluster column would crash json.dumps AFTER a
    mode=overwrite already replaced the data — the type check must fire
    BEFORE anything is written, leaving the existing directory intact."""
    from sri2db_spark.functions.layout import write_zordered

    ev_ts = _t(spark, SF, "events").select(
        "event_id", "user_id", F.expr("timestamp_micros(ts div 1000)").alias("tstamp")
    )
    with tempfile.TemporaryDirectory(prefix="ztype_") as tmp:
        path = os.path.join(tmp, "ev")
        spark.createDataFrame([(1,)], "sentinel long").write.parquet(path)
        with pytest.raises(TypeError, match="epoch ms"):
            write_zordered(ev_ts, path, ["user_id", "tstamp"], n_files=4)
        # the pre-existing data survived the rejected call
        assert spark.read.parquet(path).collect()[0].sentinel == 1


def test_read_skipping_unbounded_range_keeps_all_null_files(spark):
    """ranges may carry (None, None) for a column (documented: 'either
    bound may be None'): that constrains nothing, so files whose stats for
    it are all-null must NOT be pruned — their rows match the other
    columns' predicates and would otherwise silently vanish."""
    from sri2db_spark.functions.layout import read_skipping, write_zordered

    df = spark.createDataFrame(
        [(i, i, None if i < 50 else i) for i in range(100)],
        "id long, a long, b long",
    )
    with tempfile.TemporaryDirectory(prefix="znull_") as tmp:
        path = os.path.join(tmp, "t")
        write_zordered(df, path, ["a", "b"], n_files=4)
        got = {
            r.id
            for r in read_skipping(
                spark, path, {"a": (0, 20), "b": (None, None)}
            ).collect()
        }
    assert got == set(range(21))  # null-b rows (id<50) included


def test_read_skipping_time_travel_reads_pinned_snapshot_stats(spark, tmp_path):
    """Stats live inside the committed version, so time travel composes:
    pin a snapshot, rewrite the table, then read the PIN — both the file
    list and the pruning stats come from the pinned version."""
    from sri2db_spark.functions.layout import read_skipping, write_zordered
    from sri2db_spark.sinks.committer import ManifestCommitter

    mc = ManifestCommitter()
    path = str(tmp_path / "tt")
    v1 = spark.createDataFrame([(i, i, 10 * i) for i in range(40)], "id long, a long, b long")
    write_zordered(v1, path, ["a", "b"], n_files=2, committer=mc)
    pinned = mc.pin(path, "train-run-1")
    v2 = spark.createDataFrame([(i, i, 10 * i) for i in range(5)], "id long, a long, b long")
    write_zordered(v2, path, ["a", "b"], n_files=2, committer=mc)
    # current read sees the rewrite...
    assert read_skipping(spark, path, {"a": (0, 100)}, committer=mc).count() == 5
    # ...the pinned snapshot still answers from ITS stats and files
    old = read_skipping(
        spark, path, {"a": (30, 100)}, committer=mc, version=pinned
    )
    assert sorted(r.id for r in old.collect()) == list(range(30, 40))


# ------------------------------------------------------- zorder appends


def _zcensus(root):
    out = {}
    for dirpath, _d, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            s = os.stat(p)
            out[os.path.relpath(p, root)] = (s.st_mtime_ns, s.st_size)
    return out


def test_append_zordered_is_o_batch_and_skips_across_generations(spark, tmp_path):
    """O(batch) ingest for the data-skipping layer: an append writes ONLY
    its own clustered files, carries every prior file by reference with
    merged stats, leaves the old generation byte-identical, and
    read_skipping prunes ACROSS generations (an old-range predicate scans
    only old-generation files, a new-range one only the batch)."""
    from sri2db_spark.functions.layout import (
        append_zordered,
        read_skipping,
        write_zordered,
    )
    from sri2db_spark.functions.statestore import CARRY_MARKER
    from sri2db_spark.sinks.committer import ManifestCommitter

    mc = ManifestCommitter(keep_versions=0)
    path = str(tmp_path / "zt")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 97).cast("bigint").alias("v"),
    )
    write_zordered(mk(0, 100), path, ["id", "v"], n_files=4, committer=mc)
    base0 = mc.resolve(path)
    census0 = _zcensus(base0)

    append_zordered(mk(100, 200), path, ["id", "v"], n_files=2, committer=mc)
    base1 = mc.resolve(path)
    assert base1 != base0
    # old generation byte-identical; carried, not rewritten
    assert _zcensus(base0) == census0
    own = [f for f in os.listdir(base1) if f.endswith(".parquet")]
    assert len(own) == 2
    carry = [
        line
        for line in open(os.path.join(base1, CARRY_MARKER)).read().splitlines()
        if line
    ]
    assert len(carry) == 4
    assert all(c.startswith(os.path.basename(base0) + "/") for c in carry)

    # reads resolve both generations, exactly
    full = read_skipping(spark, path, {"id": (None, None)}, committer=mc)
    assert full.count() == 200
    old_only = read_skipping(spark, path, {"id": (0, 40)}, committer=mc)
    assert sorted(r.id for r in old_only.collect()) == list(range(41))
    assert all(os.path.basename(base0) in f for f in old_only.inputFiles())
    new_only = read_skipping(spark, path, {"id": (150, 160)}, committer=mc)
    assert sorted(r.id for r in new_only.collect()) == list(range(150, 161))
    assert all(os.path.basename(base1) in f for f in new_only.inputFiles())

    # second append: chains never deepen (entries keep their ORIGINAL
    # homes) and the carried dirs survive keep_versions=0 GC
    append_zordered(mk(200, 260), path, ["id", "v"], n_files=1, committer=mc)
    base2 = mc.resolve(path)
    carry2 = [
        line
        for line in open(os.path.join(base2, CARRY_MARKER)).read().splitlines()
        if line
    ]
    heads = {c.split("/", 1)[0] for c in carry2}
    assert heads == {os.path.basename(base0), os.path.basename(base1)}
    assert os.path.isdir(base0) and os.path.isdir(base1)
    assert (
        read_skipping(spark, path, {"id": (None, None)}, committer=mc).count()
        == 260
    )

    # a full re-cluster drops the carries and releases the old dirs
    all_rows = read_skipping(
        spark, path, {"id": (None, None)}, committer=mc
    ).localCheckpoint()
    write_zordered(all_rows, path, ["id", "v"], n_files=4, committer=mc)
    basec = mc.resolve(path)
    assert not os.path.exists(os.path.join(basec, CARRY_MARKER))
    assert not os.path.isdir(base0) and not os.path.isdir(base1)
    assert (
        read_skipping(spark, path, {"id": (None, None)}, committer=mc).count()
        == 260
    )


def test_append_zordered_guards(spark, tmp_path):
    """Carried reads fail loudly on a removed generation; appends demand
    the versioned committer and matching stats columns; an empty table
    degrades to write_zordered."""
    from sri2db_spark.functions.layout import (
        append_zordered,
        read_skipping,
    )
    from sri2db_spark.sinks.committer import ManifestCommitter, RenameCommitter

    mc = ManifestCommitter()
    path = str(tmp_path / "zg")

    def mk(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").cast("bigint").alias("id"),
            (F.col("id") % 7).cast("bigint").alias("v"),
        )

    with pytest.raises(ValueError, match="ManifestCommitter"):
        append_zordered(mk(0, 50), path, ["id", "v"], 2, committer=RenameCommitter())

    # empty table: degrades to a plain first write
    append_zordered(mk(0, 50), path, ["id", "v"], 2, committer=mc)
    base0 = mc.resolve(path)
    assert base0 is not None

    with pytest.raises(ValueError, match="stats columns"):
        append_zordered(
            mk(0, 10).withColumn("w", F.lit(1).cast("bigint")),
            path, ["id", "w"], 2, committer=mc,
        )

    append_zordered(mk(50, 80), path, ["id", "v"], 1, committer=mc)
    import shutil

    shutil.rmtree(base0)
    with pytest.raises(FileNotFoundError, match="carr"):
        read_skipping(spark, path, {"id": (0, 10)}, committer=mc).collect()


def test_append_zordered_conflicts_instead_of_losing_a_concurrent_commit(
    spark, tmp_path
):
    """append is read-modify-write: two appends built on the same base
    must not both publish (the second would carry a stats/file view that
    never saw the first's batch — its rows would silently vanish). The
    loser gets CommitConflict; retrying from the NEW base keeps both."""
    from sri2db_spark.functions.layout import (
        append_zordered,
        read_skipping,
        write_zordered,
    )
    from sri2db_spark.sinks.committer import CommitConflict, ManifestCommitter

    mc = ManifestCommitter()
    path = str(tmp_path / "zc")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 7).cast("bigint").alias("v"),
    )
    write_zordered(mk(0, 100), path, ["id", "v"], n_files=2, committer=mc)

    # a racing append lands between this append's stats read and commit:
    # simulate by hooking the loser's stage() to publish the winner first
    orig_stage = mc.stage
    raced = []

    def racing_stage(dst):
        if not raced:
            raced.append(True)
            staged = orig_stage(dst)
            mc2 = ManifestCommitter()
            append_zordered(mk(100, 150), path, ["id", "v"], 1, committer=mc2)
            return staged
        return orig_stage(dst)

    mc.stage = racing_stage
    try:
        with pytest.raises(CommitConflict):
            append_zordered(mk(150, 200), path, ["id", "v"], 1, committer=mc)
    finally:
        mc.stage = orig_stage

    # the winner's batch is intact; retrying the loser lands on top
    assert (
        read_skipping(spark, path, {"id": (None, None)}, committer=mc).count()
        == 150
    )
    append_zordered(mk(150, 200), path, ["id", "v"], 1, committer=mc)
    assert (
        read_skipping(spark, path, {"id": (None, None)}, committer=mc).count()
        == 200
    )


def test_generation_rectangle_components():
    """Unit: generation bounding rectangles + connected components under
    all-column overlap. Chains connect (A∩B, B∩C); a generation disjoint
    on ANY column stays out; missing stats are wildcards."""
    from sri2db_spark.functions.layout import (
        _generation_components,
        _generation_rectangles,
    )

    cols = ["x", "y"]
    files = {
        # own generation (bare names) spans x[0,10] y[0,5]
        "p1.parquet": {"x": [0, 5], "y": [0, 5]},
        "p2.parquet": {"x": [6, 10], "y": [0, 5]},
        # gen a overlaps own on both cols
        "v_a/p.parquet": {"x": [8, 20], "y": [3, 9]},
        # gen b overlaps a but not own (chain)
        "v_b/p.parquet": {"x": [15, 30], "y": [8, 12]},
        # gen c overlaps own on x but NOT on y -> separate
        "v_c/p.parquet": {"x": [0, 10], "y": [50, 60]},
        # gen d: missing y stats -> wildcard y (overlaps anything there),
        # but x-disjoint from every other generation -> isolated
        "v_d/p.parquet": {"x": [55, 58]},
    }
    gens = _generation_rectangles(files, cols, "v_own")
    assert gens["v_own"]["rect"] == {"x": [0, 10], "y": [0, 5]}
    assert gens["v_d"]["rect"]["y"] is None
    comps = {tuple(sorted(c)) for c in _generation_components(gens, cols)}
    assert comps == {
        ("v_a", "v_b", "v_own"),
        ("v_c",),
        ("v_d",),
    }


def test_compact_zordered_merges_only_overlapping_groups(spark, tmp_path):
    """LSM minor compaction for the skipping layer: overlapping
    generations merge into the new version's own files, disjoint files
    are carried by reference untouched, reads are unchanged, and
    files-per-point improves. Disjoint-generation tables are a committed
    NO-OP."""
    from sri2db_spark.functions.doctor import check_versioned_store
    from sri2db_spark.functions.layout import (
        append_zordered,
        compact_zordered,
        read_skipping,
        write_zordered,
    )
    from sri2db_spark.functions.statestore import CARRY_MARKER
    from sri2db_spark.sinks.committer import ManifestCommitter

    mc = ManifestCommitter(keep_versions=0)
    path = str(tmp_path / "zt")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 97).cast("bigint").alias("v"),
    )
    # three generations over the SAME id range (overlap depth 3) plus one
    # disjoint generation far away
    write_zordered(mk(0, 100), path, ["id", "v"], n_files=2, committer=mc)
    append_zordered(mk(0, 100), path, ["id", "v"], n_files=2, committer=mc)
    append_zordered(mk(0, 100), path, ["id", "v"], n_files=2, committer=mc)
    append_zordered(mk(10_000, 10_050), path, ["id", "v"], n_files=1, committer=mc)
    disjoint_home = None
    fpp_before = check_versioned_store(path, committer=mc)["info"][
        "_FILE_STATS.json"
    ]["files_per_point"]["id"]

    rep = compact_zordered(spark, path, committer=mc, min_depth=3)
    assert rep["committed"] and rep["generations_merged"] == 3
    assert rep["merged_files"] == 6  # the three overlapping generations
    assert rep["carried_files"] == 1  # the disjoint far batch
    base = mc.resolve(path)
    carry = [
        ln
        for ln in open(os.path.join(base, CARRY_MARKER)).read().splitlines()
        if ln
    ]
    assert len(carry) == 1 and "/" in carry[0]
    disjoint_home = carry[0].split("/", 1)[0]
    assert os.path.isdir(os.path.join(path, disjoint_home))  # GC kept it

    # reads identical: same rows, and the far-range scan touches only the
    # carried file while a mid-range scan stays within the merged files
    total = read_skipping(spark, path, {"id": (None, None)}, committer=mc)
    assert total.count() == 350
    far = read_skipping(spark, path, {"id": (10_000, 10_010)}, committer=mc)
    assert far.count() == 11
    assert all(disjoint_home in f for f in far.inputFiles())
    mid = read_skipping(spark, path, {"id": (40, 45)}, committer=mc)
    assert sorted(r.id for r in mid.collect()) == sorted(
        [40, 41, 42, 43, 44, 45] * 3
    )

    info = check_versioned_store(path, committer=mc)["info"]["_FILE_STATS.json"]
    assert info["files_per_point"]["id"] < fpp_before
    assert info["generations_carried"] == 1

    # already-compact table: nothing merges, nothing commits
    before = mc.resolve(path)
    rep2 = compact_zordered(spark, path, committer=mc, min_depth=3)
    assert not rep2["committed"] and rep2["merged_files"] == 0
    assert mc.resolve(path) == before


def test_compact_zordered_concurrent_append_is_cas_conflict(spark, tmp_path):
    """A batch landing between the compaction's stats read and its commit
    must surface as CommitConflict — silently overwriting the pointer
    would drop that batch from every scan."""
    from sri2db_spark.functions.layout import (
        append_zordered,
        compact_zordered,
        read_skipping,
        write_zordered,
    )
    from sri2db_spark.sinks.committer import CommitConflict, ManifestCommitter

    mc = ManifestCommitter()
    path = str(tmp_path / "zc2")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 7).cast("bigint").alias("v"),
    )
    write_zordered(mk(0, 100), path, ["id", "v"], n_files=2, committer=mc)
    append_zordered(mk(0, 100), path, ["id", "v"], n_files=2, committer=mc)
    append_zordered(mk(0, 100), path, ["id", "v"], n_files=2, committer=mc)

    orig_stage = mc.stage
    raced = []

    def racing_stage(dst):
        staged = orig_stage(dst)
        if not raced:
            raced.append(True)
            mc2 = ManifestCommitter()
            append_zordered(mk(200, 250), path, ["id", "v"], 1, committer=mc2)
        return staged

    mc.stage = racing_stage
    try:
        with pytest.raises(CommitConflict):
            compact_zordered(spark, path, committer=mc, min_depth=3)
    finally:
        mc.stage = orig_stage

    # the racing batch is intact; the retried compaction lands on top
    assert (
        read_skipping(spark, path, {"id": (None, None)}, committer=mc).count()
        == 350
    )
    rep = compact_zordered(spark, path, committer=mc, min_depth=3)
    assert rep["committed"]
    assert (
        read_skipping(spark, path, {"id": (None, None)}, committer=mc).count()
        == 350
    )


def test_zorder_compact_cli(spark, tmp_path, capsys):
    from sri2db_spark import cli
    from sri2db_spark.functions.layout import append_zordered, write_zordered
    from sri2db_spark.sinks.committer import ManifestCommitter

    mc = ManifestCommitter()
    path = str(tmp_path / "zcli")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 7).cast("bigint").alias("v"),
    )
    write_zordered(mk(0, 50), path, ["id", "v"], n_files=1, committer=mc)
    append_zordered(mk(0, 50), path, ["id", "v"], n_files=1, committer=mc)
    append_zordered(mk(0, 50), path, ["id", "v"], n_files=1, committer=mc)

    assert cli.main(["zorder-compact", "--table", path]) == 0
    out = capsys.readouterr().out
    assert "zorder-compact ok: 3 generations" in out

    assert cli.main(["zorder-compact", "--table", path]) == 0
    out = capsys.readouterr().out
    assert "nothing to do" in out


def test_retract_from_zordered_touches_only_pruned_files(spark, tmp_path):
    """RTBF for the skipping table: the published per-file id ranges
    select the rewrite set — victims vanish, untouched generations stay
    byte-identical as carry references, scans are exact, and absent ids
    are committed no-ops."""
    import json

    from sri2db_spark.functions.layout import (
        FILE_STATS,
        append_zordered,
        read_skipping,
        retract_from_zordered,
        write_zordered,
    )
    from sri2db_spark.sinks.committer import ManifestCommitter

    mc = ManifestCommitter(keep_versions=0)
    path = str(tmp_path / "zr")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 13).cast("bigint").alias("v"),
    )
    # base 0..400 over 4 files (disjoint id ranges) + far append
    write_zordered(
        mk(0, 400).repartitionByRange(4, "id"), path, ["id", "v"],
        n_files=4, committer=mc,
    )
    base0 = mc.resolve(path)
    append_zordered(mk(10_000, 10_100), path, ["id", "v"], 1, committer=mc)
    base1 = mc.resolve(path)
    census_far = _zcensus(base1)

    # victims clustered in one id range: only that file rewrites
    n = retract_from_zordered(spark, path, [5, 7, 9], "id", committer=mc)
    assert n == 3
    base2 = mc.resolve(path)
    meta = json.loads(open(os.path.join(base2, FILE_STATS)).read())
    own = [e for e in meta["files"] if "/" not in e]
    carried = [e for e in meta["files"] if "/" in e]
    # pruned rewrite: the z-interleave may spread 3 clustered ids over a
    # couple of base files, but never the whole table — and the far
    # generation (id range 10k+) must ride as an untouched carry
    assert len(own) <= 2
    assert len(carried) >= 3
    assert any(e.startswith(os.path.basename(base1)) for e in carried)
    assert _zcensus(base1) == census_far  # old version byte-identical
    assert os.path.isdir(base0) and os.path.isdir(base1)  # GC-protected

    total = read_skipping(spark, path, {"id": (None, None)}, committer=mc)
    assert total.count() == 400 + 100 - 3
    assert not {5, 7, 9} & {r.id for r in total.collect()}

    # absent ids whose values fall inside ranges: probe runs, no commit
    before = mc.resolve(path)
    assert retract_from_zordered(spark, path, [6_000], "id", committer=mc) == 0
    assert mc.resolve(path) == before

    # non-stats id column: correct, just unpruned (all files candidates)
    remaining_ids = [
        i
        for i in list(range(400)) + list(range(10_000, 10_100))
        if i not in (5, 7, 9)
    ]
    expected_v10 = sum(1 for i in remaining_ids if i % 13 == 10)
    n2 = retract_from_zordered(spark, path, [10], "v", committer=mc)
    assert n2 == expected_v10
    left = read_skipping(spark, path, {"id": (None, None)}, committer=mc)
    assert not any(r.v == 10 for r in left.collect())

    # type-mismatched ids against the numeric stats column must FAIL,
    # not silently prune everything and record removed=0
    with pytest.raises(TypeError, match="numeric"):
        retract_from_zordered(spark, path, ["5", "7"], "id", committer=mc)

    # retracting EVERYTHING is refused (a committed empty version would
    # be unreadable); partial full-file retractions still work
    with pytest.raises(ValueError, match="empties the whole table"):
        retract_from_zordered(
            spark, path,
            [i for i in remaining_ids if i % 13 != 10],
            "id", committer=mc,
        )


def test_retract_from_zordered_concurrent_append_is_cas_conflict(
    spark, tmp_path
):
    from sri2db_spark.functions.layout import (
        append_zordered,
        read_skipping,
        retract_from_zordered,
        write_zordered,
    )
    from sri2db_spark.sinks.committer import CommitConflict, ManifestCommitter

    mc = ManifestCommitter()
    path = str(tmp_path / "zrc")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 7).cast("bigint").alias("v"),
    )
    write_zordered(mk(0, 100), path, ["id", "v"], n_files=2, committer=mc)

    orig_stage = mc.stage
    raced = []

    def racing_stage(dst):
        staged = orig_stage(dst)
        if not raced:
            raced.append(True)
            mc2 = ManifestCommitter()
            append_zordered(mk(200, 250), path, ["id", "v"], 1, committer=mc2)
        return staged

    mc.stage = racing_stage
    try:
        with pytest.raises(CommitConflict):
            retract_from_zordered(spark, path, [3], "id", committer=mc)
    finally:
        mc.stage = orig_stage
    # racer intact; retry lands
    assert retract_from_zordered(spark, path, [3], "id", committer=mc) == 1
    assert (
        read_skipping(spark, path, {"id": (None, None)}, committer=mc).count()
        == 149
    )


def test_write_zordered_rewrite_conflicts_with_concurrent_commit(
    spark, tmp_path
):
    """A full rewrite resolves prev (to carry _STREAM_* replay marks), so
    its pointer write must be a CAS like append/compact/retract: a stream
    batch committing between resolve() and commit() must surface as
    CommitConflict, not be silently clobbered (data AND high-water mark
    lost) — ADVICE r8."""
    import os

    from sri2db_spark.functions.layout import (
        append_zordered,
        read_skipping,
        write_zordered,
    )
    from sri2db_spark.sinks.committer import CommitConflict, ManifestCommitter

    mc = ManifestCommitter()
    path = str(tmp_path / "zw")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 7).cast("bigint").alias("v"),
    )
    write_zordered(mk(0, 100), path, ["id", "v"], n_files=2, committer=mc)

    orig_resolve = mc.resolve
    raced = []

    def racing_resolve(dst, *a, **kw):
        stale = orig_resolve(dst, *a, **kw)
        if not raced:
            raced.append(True)
            # a streaming batch (with its replay mark) lands between the
            # rewrite's resolve and its commit
            append_zordered(
                mk(100, 150), path, ["id", "v"], 1,
                committer=ManifestCommitter(),
                markers={"_STREAM_BATCH": "7"},
            )
        return stale  # the rewrite saw the PRE-race version

    mc.resolve = racing_resolve
    try:
        with pytest.raises(CommitConflict):
            write_zordered(mk(0, 10), path, ["id", "v"], n_files=1, committer=mc)
    finally:
        mc.resolve = orig_resolve

    # the stream's batch and its high-water mark both survived
    assert (
        read_skipping(spark, path, {"id": (None, None)}, committer=mc).count()
        == 150
    )
    base = mc.resolve(path)
    assert open(os.path.join(base, "_STREAM_BATCH")).read() == "7"
