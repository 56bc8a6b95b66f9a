#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink (full execution, no driver
collect). Times are end-to-end per query on a warm session.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from sri2db_spark.plans.analytics import QUERIES  # noqa: E402
from sri2db_spark.session import get_spark  # noqa: E402

# Entries measured by bespoke blocks below (not via the QUERIES registry);
# ONE list shared by the selection validation and the gated blocks so a
# new block cannot be forgotten in the known-names check
EXTRA_ENTRIES = [
    "sri_full_sync_20k",
    "sri_full_sync_20k_sharded",
    "sri_full_sync_2m_sharded",
    "sri_delta_sync_200k",
    "sri_delta_sync_200k_sharded",
    "sri_delta_sync_260k_dupskew",
    "ann_ivfpq_query_64q",
    "ann_ivfpq_bulk_10k",
    "ann_ivfpq_bulk_10k_shuffle",
    "state_retract_pruned",
]

# Representative coverage: heavy scans/aggs, multi-join, window, merge ops,
# dedup sketches, similarity, text pipeline.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_running_total",
    "events_hourly",
    "c1_dedup_latest",
    "c5_nullsafe_change",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality",
    "text_fingerprint",
    "text_repetition",
    "boilerplate_frac",
    "dedup_survivors",
    "dedup_survivors_lsh",
    "q7_nation_volume",
    "multimodal_meta",
    "segment_dedup",
    "bm25_topk",
    "ngram_topk",
    "dup_spans",
    "dup_span_coverage",
    "hybrid_rrf_topk",
    "ann_matryoshka_topk",
    "pagerank_copurchase",
    "pagerank_converged",
    "quality_calibration",
    "triangle_knn",
    "decontaminate_spans",
    "decontaminate_corpus",
    "dedup_corpus_spans",
    # r12: the BPE token-accounting family — the fold is a pure-JVM
    # projection (vocab_topk adds one token hash-agg), so these double as
    # a codegen-throughput probe
    "bpe_token_stats",
    "bpe_vocab_topk",
    "gopher_quality_flags",
    "gopher_repetition_flags",
    "c4_quality_flags",
]


def run_session() -> dict:
    """One fresh-JVM measurement pass over every bench entry; returns
    ``{"medians", "mins", "spreads", "repeats"}`` per query. The per-JVM
    JIT plateau (tools/bench_bimodality_probe.py) makes any single
    session's numbers sit 0-30% above another's on identical code — the
    cross-SESSION aggregation in :func:`main` is what removes that."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    # SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run to named entries —
    # for targeted captures (the sf1 skew run only exercises the
    # skew-sensitive entries) without perturbing the default suite
    only = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if s.strip()
    }
    known = set(HEADLINE) | set(EXTRA_ENTRIES)
    unknown = only - known
    if unknown:
        # a typo'd name would otherwise yield an EMPTY passing run that
        # measured nothing and could be recorded as evidence
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_ONLY names unknown entries: {sorted(unknown)}"
            f"; known: {sorted(known)}"
        )

    def _selected(name: str) -> bool:
        return not only or name in only

    spark = get_spark(app_name="sri2db_spark_bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up: JVM/codegen plus one scan of each input table so per-query
    # timings measure the query, not first-touch page-cache/footer reads.
    spark.range(1000).selectExpr("sum(id)").collect()
    from sri2db_spark.plans.analytics import _t  # noqa: PLC0415

    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        _t(spark, sf_dir, t).count()

    # Machine fingerprint (r12 verdict item 5: cross-day drift of 13-57% on
    # byte-identical code kept masquerading as regressions). Two fixed,
    # data-independent probes measured per session — a JVM codegen fold and
    # a pure-Python loop — so any future PERF comparison can separate
    # machine drift (probes moved too) from a code regression (probes
    # flat). Diagnostics only: the headline JSON is untouched.
    t0 = time.perf_counter()
    # pmod keeps the running sum far from long overflow under ANSI mode
    spark.range(500_000_000).selectExpr("sum(pmod(xxhash64(id), 1000))").collect()
    jvm_probe = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    py_probe = round(time.perf_counter() - t0, 3)
    machine_probe = {
        "jvm_sum_500m_s": jvm_probe,
        "py_loop_5m_s": py_probe,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }

    # Median-of-N per query with cache clearing between runs: sketch ops
    # persist intermediates, and leftover cached blocks + GC make single
    # runs noisy (round-2 showed ±50-90% phantom swings on unchanged code).
    # N=5 with an interquartile spread (the distance across the central
    # three runs) pins the noise floor: round-4's max−min of 3 let one GC
    # pause put a 40% phantom swing on q1, making a 2× regression bar
    # unenforceable for sub-2s queries.
    # Default 3 in-session repeats: the reported statistic is the
    # cross-session MIN (see main), which needs plateau diversity more
    # than in-session depth — min-of-3 already lands past the JIT warm-up
    # slope, and two extra sessions beat eight extra repeats inside one.
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    # The two historically bimodal entries (3.0↔4.1 s across rounds on
    # byte-identical code) get a floor of 5 repeats: their JIT warm-up
    # slope is the steepest (2-6 s of compile time PER RUN on the large
    # generated classes — 128-perm OPH / n-gram explode), so the first
    # couple of runs sit 20-40% above steady state and a min-of-3 could
    # still land on the slope. Floor, not override: a caller raising
    # SPARK_GRAFT_BENCH_REPEAT above 5 gets that many runs here too, and
    # the emitted per-query "repeats" map records the actual count.
    extra_repeat = {
        "dedup_minhash_lsh": max(repeat, 5),
        # r12 probe (tools/bench_bimodality_probe.py, 12 repeats each):
        # boilerplate_frac (+30% over two rounds), ngram_topk (+24% r11)
        # and quality_calibration (+15% r11) all show a pure JIT warm-up
        # slope — per-run compile time decays 8900→500 ms while GC stays
        # flat at 5-50 ms — with wall reaching steady state only at run
        # ~6-8 (boilerplate 2.58→1.39 s, ngram 0.92→0.75 s, qcal
        # 1.63→0.81 s). A min-of-3/5 lands ON the slope at a session-
        # dependent point, which is exactly the observed cross-round
        # drift on unchanged code. Floor of 8 puts the min past the
        # slope knee for all three (~40 s extra bench wall total).
        "ngram_topk": max(repeat, 8),
        "boilerplate_frac": max(repeat, 8),
        "quality_calibration": max(repeat, 8),
        # the ETL sync and bulk-ANN entries have the other steep warm-up
        # slopes (merge-pipeline / LUT-projection codegen): a min-of-3 can
        # still land on the slope, which showed up as the only >10%
        # run-to-run min deltas above 0.5 s in the r9 stability A/B
        "sri_full_sync_20k": max(repeat, 5),
        "sri_full_sync_20k_sharded": max(repeat, 5),
        "ann_ivfpq_bulk_10k": max(repeat, 5),
        "ann_ivfpq_bulk_10k_shuffle": max(repeat, 5),
    }
    repeats_used: dict[str, int] = {}

    def _spread(sorted_runs: list[float]) -> float:
        n = len(sorted_runs)
        if n >= 4:
            return round(sorted_runs[(3 * n) // 4] - sorted_runs[n // 4], 3)
        return round(sorted_runs[-1] - sorted_runs[0], 3)

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    mins: dict[str, float] = {}

    def _record_stats(name: str, runs: list[float]) -> None:
        # one place for the per-entry statistics, so a new diagnostic
        # field can never be silently dropped by one of the bespoke
        # measurement blocks (each previously hand-wrote these lines)
        runs = sorted(runs)
        timings[name] = round(runs[len(runs) // 2], 3)
        spreads[name] = _spread(runs)
        mins[name] = round(runs[0], 3)
        repeats_used[name] = len(runs)
    for name in HEADLINE:
        if not _selected(name):
            continue
        fn = QUERIES[name]
        # One untimed warmup: whole-stage codegen compilation of a large
        # expression tree (e.g. 128 OPH mins) is a per-session JVM constant —
        # 3-4× the steady-state time on the first run — not a per-query
        # throughput cost on a long-lived cluster.
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs: list[float] = []
        # _record_stats is the single writer of repeats_used (= len(runs))
        for _ in range(extra_repeat.get(name, repeat)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        _record_stats(name, runs)

    # ETL throughput: full sync of a 20k-resource fake SRI collection at the
    # reference's defaults (500/page) into a lake partition — the number most
    # directly comparable to the reference's records/s (its only published
    # signals are sync timings, BASELINE.md).
    import shutil
    import sys
    import tempfile

    if _selected("sri_full_sync_20k") or _selected("sri_full_sync_20k_sharded"):
        sys.path.insert(0, os.path.join(REPO, "tests"))
        # the sharded sync pickles the fake API's fetch_json into executor
        # Python workers, which need the module importable there too
        spark.sparkContext.addPyFile(os.path.join(REPO, "tests", "fake_api.py"))
        from fake_api import FakeSriApi  # noqa: E402, PLC0415

        from sri2db_spark.model.schema import LAYOUT_LARGE  # noqa: PLC0415
        from sri2db_spark.sinks.lake import LakeTable  # noqa: PLC0415
        from sri2db_spark.sources.sri_api import SriApiReader  # noqa: PLC0415
        from sri2db_spark.sync.engine import Sri2DbSync  # noqa: PLC0415

        n_resources = 20_000
        api = FakeSriApi(n=n_resources, page_size=500)
        tmp = tempfile.mkdtemp(prefix="bench_sync_")
        if _selected("sri_full_sync_20k"):
            sync = Sri2DbSync(
                reader=SriApiReader(spark, "https://bench.local", fetch_json=api.fetch_json, limit=500),
                table=LakeTable(spark, os.path.join(tmp, "table"), LAYOUT_LARGE),
                path="/a",
                baseurl="https://bench.local",
                layout=LAYOUT_LARGE,
            )
            sync.full_sync()  # untimed warmup: merge-pipeline codegen
            sync_runs: list[float] = []
            for _ in range(extra_repeat["sri_full_sync_20k"]):
                t0 = time.perf_counter()
                result = sync.full_sync()
                sync_runs.append(time.perf_counter() - t0)
                assert result.rows_after == n_resources
            _record_stats("sri_full_sync_20k", sync_runs)

        # Same 20k full sync through the A2 offset-sharded scale path:
        # disjoint executor-owned offset ranges paged inside Python workers
        # (the shape a 1000-executor ingest uses) instead of
        # driver-sequential next links.
        if _selected("sri_full_sync_20k_sharded"):
            sync_sh = Sri2DbSync(
                reader=SriApiReader(spark, "https://bench.local", fetch_json=api.fetch_json, limit=500),
                table=LakeTable(spark, os.path.join(tmp, "table_sh"), LAYOUT_LARGE),
                path="/a",
                baseurl="https://bench.local",
                layout=LAYOUT_LARGE,
                full_sync_shard_size=2500,
            )
            sync_sh.full_sync()  # untimed warmup: worker spin-up + codegen
            sh_runs: list[float] = []
            for _ in range(extra_repeat["sri_full_sync_20k_sharded"]):
                t0 = time.perf_counter()
                result = sync_sh.full_sync()
                sh_runs.append(time.perf_counter() - t0)
                assert result.rows_after == n_resources
            _record_stats("sri_full_sync_20k_sharded", sh_runs)
        shutil.rmtree(tmp, ignore_errors=True)

    # Scale points for the merge path itself (r11): a 2M-resource full sync
    # through the A2 offset-sharded reader, a clean 200k delta with 20k
    # tombstones, and a duplicate-skewed 260k delta (60k exact duplicate
    # echoes concentrated on 50 hrefs — the paging-drift/retry shape the C1
    # dedup window exists for). The API is GENERATED (SyntheticSriApi: a
    # pure function of index, no stored corpus), so the bench measures the
    # reader + merge, not fixture construction. One timed run each — these
    # are 15-35 s entries; cross-session minima do the stabilizing.
    scale_sync_names = (
        "sri_full_sync_2m_sharded",
        "sri_delta_sync_200k",
        "sri_delta_sync_200k_sharded",
        "sri_delta_sync_260k_dupskew",
    )
    if any(_selected(nm) for nm in scale_sync_names):
        sys.path.insert(0, os.path.join(REPO, "tests"))
        spark.sparkContext.addPyFile(os.path.join(REPO, "tests", "fake_api.py"))
        from fake_api import SyntheticSriApi, seq_ts  # noqa: E402, PLC0415

        from sri2db_spark.model.schema import LAYOUT_LARGE  # noqa: PLC0415
        from sri2db_spark.operators.watermark import WatermarkStore  # noqa: PLC0415
        from sri2db_spark.sinks.lake import LakeTable  # noqa: PLC0415
        from sri2db_spark.sources.sri_api import SriApiReader  # noqa: PLC0415
        from sri2db_spark.sync.engine import Sri2DbSync  # noqa: PLC0415

        n_big = 2_000_000
        tmp = tempfile.mkdtemp(prefix="bench_sync2m_")

        def _mk(api, sub, delta_shard=None):
            return Sri2DbSync(
                reader=SriApiReader(
                    spark, "https://bench.local", fetch_json=api.fetch_json,
                    limit=5000,
                ),
                table=LakeTable(spark, os.path.join(tmp, sub), LAYOUT_LARGE),
                path="/a",
                baseurl="https://bench.local",
                layout=LAYOUT_LARGE,
                watermarks=WatermarkStore(spark, os.path.join(tmp, f"w_{sub}")),
                full_sync_shard_size=62_500,
                delta_sync_shard_size=delta_shard,
            )

        if _selected("sri_full_sync_2m_sharded"):
            api = SyntheticSriApi(n=n_big, page_size=5000)
            sync2m = _mk(api, "t2m")
            t0 = time.perf_counter()
            res = sync2m.full_sync()
            _record_stats("sri_full_sync_2m_sharded", [time.perf_counter() - t0])
            assert res.rows_after == n_big
        # entry -> (feed config, delta_sync_shard_size). The _sharded entry
        # (r13) is the SAME 200k feed through the A2 offset-sharded delta
        # scan (executor-side paging, 6250-row shards = 32 executor-owned
        # ranges) instead of the driver-sequential A4 next-link scan, which
        # stays benched beside it as the reference-fidelity path.
        delta_cfgs = {
            "sri_delta_sync_200k": (
                dict(n=n_big, page_size=5000, n_updates=200_000, n_tombstones=20_000),
                None,
            ),
            "sri_delta_sync_200k_sharded": (
                dict(n=n_big, page_size=5000, n_updates=200_000, n_tombstones=20_000),
                6_250,
            ),
            "sri_delta_sync_260k_dupskew": (
                dict(
                    n=n_big, page_size=5000, n_updates=200_000,
                    n_hot_echoes=60_000, n_hot=50, n_tombstones=20_000,
                ),
                None,
            ),
        }
        subdirs = {
            "sri_delta_sync_200k": "td",
            "sri_delta_sync_200k_sharded": "tdsh",
            "sri_delta_sync_260k_dupskew": "ts",
        }
        base_loaded = None  # the 2M base table is identical for all deltas:
        # full-sync once, file-copy for the others (untimed either way)
        for entry_name, (cfg, delta_shard) in delta_cfgs.items():
            if not _selected(entry_name):
                continue
            sub = subdirs[entry_name]
            if base_loaded is not None:
                # copy table + watermarks BEFORE the sink objects touch the
                # directories (copytree requires a fresh destination)
                shutil.copytree(
                    os.path.join(tmp, base_loaded), os.path.join(tmp, sub)
                )
                shutil.copytree(
                    os.path.join(tmp, f"w_{base_loaded}"),
                    os.path.join(tmp, f"w_{sub}"),
                )
            syncd = _mk(SyntheticSriApi(**cfg), sub, delta_shard=delta_shard)
            if base_loaded is None:
                syncd.full_sync()  # untimed base load
                base_loaded = sub
            t0 = time.perf_counter()
            res = syncd.delta_sync(modified_since=seq_ts(60 * n_big))
            _record_stats(entry_name, [time.perf_counter() - t0])
            assert res.rows_after == n_big - 20_000
        shutil.rmtree(tmp, ignore_errors=True)

    # Steady-state ANN serving: the index is built ONCE (the amortized cost a
    # deployment pays per retrain, not per query); we time only the query path
    # against the saved IVF-PQ index — probed-cell pruning + code-only ADC.
    ann_names = ("ann_ivfpq_query_64q", "ann_ivfpq_bulk_10k", "ann_ivfpq_bulk_10k_shuffle")
    if any(_selected(n) for n in ann_names):
        from pyspark.sql import functions as F  # noqa: PLC0415

        from sri2db_spark.functions import similarity as S  # noqa: PLC0415
        from sri2db_spark.plans.analytics import _tp  # noqa: PLC0415

        emb = _tp(spark, sf_dir, "embeddings")
        idx_tmp = tempfile.mkdtemp(prefix="bench_ivfpq_")
        try:
            S.build_ivfpq_index(emb, idx_tmp, nlist=16, m=4, ksub=16, pq_iters=1)
            if _selected("ann_ivfpq_query_64q"):
                queries = emb.filter(F.col("vec_id") < 64)
                q_runs: list[float] = []
                S.ivfpq_query_index(spark, idx_tmp, queries, k=5, nprobe=4).write.format(
                    "noop"
                ).mode("overwrite").save()  # untimed warmup
                for _ in range(repeat):
                    t0 = time.perf_counter()
                    S.ivfpq_query_index(spark, idx_tmp, queries, k=5, nprobe=4).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    q_runs.append(time.perf_counter() - t0)
                _record_stats("ann_ivfpq_query_64q", q_runs)

            # Bulk offline scoring: 10,000 queries in ONE job — the regime
            # the distributed LUT build exists for (the former driver-side
            # loop serialized m·ksub·|queries| doubles through the driver
            # and was the one flagged scale bottleneck). Query ids are
            # shifted clear of corpus ids so self-match never triggers.
            from functools import reduce  # noqa: PLC0415

            bulk_q = reduce(
                lambda a, b: a.unionByName(b),
                [
                    emb.select(
                        (F.col("vec_id") + F.lit(100_000 * (i + 1))).alias("vec_id"),
                        "embedding",
                    )
                    for i in range(5)
                ],
            )
            if _selected("ann_ivfpq_bulk_10k"):
                b_runs: list[float] = []
                S.ivfpq_query_index(spark, idx_tmp, bulk_q, k=5, nprobe=4).write.format(
                    "noop"
                ).mode("overwrite").save()  # untimed warmup
                for _ in range(extra_repeat["ann_ivfpq_bulk_10k"]):
                    t0 = time.perf_counter()
                    S.ivfpq_query_index(spark, idx_tmp, bulk_q, k=5, nprobe=4).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    b_runs.append(time.perf_counter() - t0)
                _record_stats("ann_ivfpq_bulk_10k", b_runs)

            # Same 10k-query job through the sort-merge path
            # (broadcast_queries=False): the shape that has NO per-job query
            # ceiling — both sides shuffle by cell, nothing broadcasts.
            if _selected("ann_ivfpq_bulk_10k_shuffle"):
                s_runs: list[float] = []
                S.ivfpq_query_index(
                    spark, idx_tmp, bulk_q, k=5, nprobe=4, broadcast_queries=False
                ).write.format("noop").mode("overwrite").save()  # untimed warmup
                for _ in range(extra_repeat["ann_ivfpq_bulk_10k_shuffle"]):
                    t0 = time.perf_counter()
                    S.ivfpq_query_index(
                        spark, idx_tmp, bulk_q, k=5, nprobe=4, broadcast_queries=False
                    ).write.format("noop").mode("overwrite").save()
                    s_runs.append(time.perf_counter() - t0)
                _record_stats("ann_ivfpq_bulk_10k_shuffle", s_runs)
        finally:
            shutil.rmtree(idx_tmp, ignore_errors=True)

    # Pruned right-to-be-forgotten (SURVEY §7.9): the curation state is
    # built ONCE (64 range-partitioned base files with _PRUNE_STATS); each
    # timed run retracts 3 fresh clustered ids — the commit rewrites the
    # one file whose id range they hit and carries the other ~63 by
    # reference, so this number tracks touched files, not store size.
    if _selected("state_retract_pruned"):
        # NOT shared with the ANN block's import: that block may be
        # deselected while this one runs (SPARK_GRAFT_BENCH_ONLY)
        from pyspark.sql import functions as F  # noqa: PLC0415

        from sri2db_spark.functions import pipeline as P  # noqa: PLC0415
        from sri2db_spark.sinks.committer import ManifestCommitter  # noqa: PLC0415

        st_tmp = tempfile.mkdtemp(prefix="bench_state_")
        try:
            mc = ManifestCommitter()
            state = os.path.join(st_tmp, "state")
            docs = (
                spark.range(32_000)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat(
                        F.lit("benchmark document number "),
                        F.col("id"),
                        F.lit(" with deterministic unique filler words "),
                        F.col("id"),
                    ).alias("text"),
                    F.lit("en").alias("lang"),
                )
                .repartitionByRange(64, "doc_id")
            )
            P.init_curation_state(docs, state, committer=mc)
            P.retract_from_state(spark, state, [1, 2, 3], committer=mc)  # warmup
            r_runs: list[float] = []
            for i in range(repeat):
                ids = [10 + 3 * i, 11 + 3 * i, 12 + 3 * i]
                t0 = time.perf_counter()
                P.retract_from_state(spark, state, ids, committer=mc)
                r_runs.append(time.perf_counter() - t0)
            _record_stats("state_retract_pruned", r_runs)
        finally:
            shutil.rmtree(st_tmp, ignore_errors=True)

    spark.stop()
    return {
        "medians": timings,
        "mins": mins,
        "spreads": spreads,
        "repeats": repeats_used,
        "machine_probe": machine_probe,
    }


def main() -> None:
    """Run the suite in N FRESH JVM sessions (default 3; env
    SPARK_GRAFT_BENCH_SESSIONS) and report per-query CROSS-SESSION MINS.

    The r7 bimodality probe pinned the dominant noise: each JVM session
    settles on its own JIT plateau, so two captures of identical code can
    differ ±30-79% per query in either direction (BENCH_r07 vs r08).
    Additive noise only ever inflates a run, so the min over sessions ×
    repeats is the statistic that tracks the CODE — it is exactly what the
    round-8 A/B used to clear the phantom sync regression. Diagnostics
    carry each session's mins plus the cross-session spread percentage so
    a regression claim can be checked against the plateau width."""
    sessions = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    if os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        out = run_session()
        print(json.dumps({"detail": "bench_session", **out}, separators=(",", ":")))
        return

    if sessions <= 1:
        results = [run_session()]
    else:
        import subprocess  # noqa: PLC0415

        results = []
        for i in range(sessions):
            env = {**os.environ, "SPARK_GRAFT_BENCH_CHILD": "1"}
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True,
                text=True,
                env=env,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(f"bench session {i} failed ({proc.returncode})")
            last = [l for l in proc.stdout.splitlines() if l.strip()][-1]
            results.append(json.loads(last))

    names = list(results[0]["mins"])
    queries: dict[str, float] = {}
    spread_pct: dict[str, float] = {}
    session_mins = {r_i: res["mins"] for r_i, res in enumerate(results)}
    spread_violations: dict[str, float] = {}
    min_stability_pct: dict[str, float] = {}
    # pass/fail variance gate (r9 verdict item 3). The reported statistic
    # is the cross-session MIN, so the gate measures how well-ESTIMATED
    # that min is: the gap between the two lowest session-mins
    # (min-stability). The full max-min spread is kept as a diagnostic —
    # it measures the JIT-plateau width (one slow outlier session widens
    # it arbitrarily, which is exactly what the min statistic discards)
    # and GROWS with session count, so gating on it would punish running
    # more sessions. Violation = instability above GATE_PCT *and* a
    # non-trivial absolute margin — percentage alone would flag
    # sub-second entries on 0.1 s of scheduler noise (the r9
    # dup_span_coverage observation), absolute alone would miss a 20%
    # drift on a 30 s entry.
    gate_pct = float(os.environ.get("SPARK_GRAFT_BENCH_SPREAD_GATE_PCT", "10"))
    gate_abs_s = float(os.environ.get("SPARK_GRAFT_BENCH_SPREAD_GATE_ABS_S", "0.25"))
    for q in names:
        per_session = sorted(res["mins"][q] for res in results)
        best = per_session[0]
        queries[q] = best
        spread_pct[q] = round(
            100.0 * (per_session[-1] - best) / best if best > 0 else 0.0, 1
        )
        if len(per_session) > 1 and best > 0:
            stab = 100.0 * (per_session[1] - best) / best
            min_stability_pct[q] = round(stab, 1)
            if stab > gate_pct and (per_session[1] - best) > gate_abs_s:
                spread_violations[q] = min_stability_pct[q]
    total = round(sum(queries.values()), 3)
    # Scaling gate (r11 verdict item 4): with a baseline capture from a
    # DIFFERENT scale factor (SPARK_GRAFT_BENCH_ALPHA_BASELINE=<json with
    # "queries" and "sf">), compute each common entry's fitted log-log
    # exponent alpha (time ~ sf^alpha) and flag data-proportional entries
    # at alpha >= 1.05 — superlinear growth a 100x scale-up won't survive.
    # Entries whose WORK grows superlinearly by construction are exempt
    # (the bulk-ANN entries scale query count x corpus together), as are
    # fixed-work entries (alpha ~ 0 passes the gate trivially anyway).
    alpha_gate: dict = {}
    baseline_path = os.environ.get("SPARK_GRAFT_BENCH_ALPHA_BASELINE")
    if baseline_path:
        import math  # noqa: PLC0415

        alpha_exempt = {"ann_ivfpq_bulk_10k", "ann_ivfpq_bulk_10k_shuffle"}
        # sub-second entries carry large relative noise (per-job constants
        # dominate): a violation additionally requires the entry to cost
        # real time at the bigger SF
        alpha_abs_floor_s = float(
            os.environ.get("SPARK_GRAFT_BENCH_ALPHA_FLOOR_S", "1.0")
        )
        base = json.load(open(baseline_path))
        if "parsed" in base and base["parsed"]:
            base = base["parsed"]
        b_sf, b_q = float(base["sf"]), base["queries"]
        alphas: dict[str, float] = {}
        alpha_violations: dict[str, float] = {}
        if b_sf != sf:
            for q in sorted(set(queries) & set(b_q)):
                if queries[q] <= 0 or b_q[q] <= 0:
                    continue
                a = math.log(queries[q] / b_q[q]) / math.log(sf / b_sf)
                alphas[q] = round(a, 2)
                big_t = queries[q] if sf > b_sf else b_q[q]
                if (
                    a >= 1.05
                    and q not in alpha_exempt
                    and big_t >= alpha_abs_floor_s
                ):
                    alpha_violations[q] = alphas[q]
        alpha_gate = {
            "baseline_sf": b_sf,
            "threshold": 1.05,
            "abs_floor_s": alpha_abs_floor_s,
            "exempt": sorted(alpha_exempt),
            "alphas": alphas,
            "violations": alpha_violations,
            "pass": not alpha_violations,
        }
    # diagnostics first (per-session maps grow as entries are added), THEN
    # the compact headline object as the very last stdout line: the driver
    # tail-captures a bounded window and BENCH_r07 arrived truncated
    # mid-object ("parsed": null) when everything was one line.
    print(
        json.dumps(
            {
                "detail": "bench_diagnostics",
                "statistic": "min over sessions x repeats",
                "sessions": len(results),
                "session_mins": session_mins,
                "machine_probe": {
                    r_i: res.get("machine_probe") for r_i, res in enumerate(results)
                },
                "cross_session_spread_pct": spread_pct,
                "min_stability_pct": min_stability_pct,
                "spread_gate": {
                    "metric": "min_stability (gap between two lowest session-mins)",
                    "pct": gate_pct,
                    "abs_s": gate_abs_s,
                    "violations": spread_violations,
                    "pass": not spread_violations,
                },
                "alpha_gate": alpha_gate,
                "medians_last_session": results[-1]["medians"],
                "spreads_last_session": results[-1]["spreads"],
                "repeats": results[-1]["repeats"],
            },
            separators=(",", ":"),
        )
    )
    if alpha_gate and not alpha_gate["pass"]:
        sys.stderr.write(
            "bench alpha gate: superlinear scaling (alpha >= 1.05) on: "
            + ", ".join(
                f"{q}={a}" for q, a in sorted(alpha_gate["violations"].items())
            )
            + "\n"
        )
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": int(cpus),
                "sessions": len(results),
            },
            separators=(",", ":"),
        )
    )
    if spread_violations:
        # always VISIBLE; only FATAL when the caller opts into gating
        # (the driver's capture must still record the numbers)
        sys.stderr.write(
            "bench spread gate: min-stability exceeds "
            f"{gate_pct}% (+{gate_abs_s}s) on: "
            + ", ".join(
                f"{q}={p}%" for q, p in sorted(spread_violations.items())
            )
            + "\n"
        )
        if os.environ.get("SPARK_GRAFT_BENCH_SPREAD_GATE"):
            raise SystemExit(4)


if __name__ == "__main__":
    main()
