#!/usr/bin/env python
"""End-to-end curation pipeline measurement: run functions.pipeline.curate_full
stage by stage at a given SF dir, materializing each stage boundary, writing
the final packed corpus + shard manifest through the committer, and doctoring
every artifact. Prints ONE JSON line:

  {"sf_dir": ..., "total_sec": ..., "stages": {name: sec}, "rows": {...},
   "doctor": {...}, "manifest_hash": ...}

Usage: SPARK_GRAFT_SF_DIR=/tmp/sgscale/sf1 python tools/pipeline_e2e.py
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sri2db_spark.functions.pipeline import curate_full  # noqa: E402
from sri2db_spark.plans.analytics import _tp  # noqa: E402
from sri2db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    out_root = os.environ.get("PIPE_E2E_OUT") or tempfile.mkdtemp(prefix="pipe_e2e_")
    keep_out = bool(os.environ.get("PIPE_E2E_OUT"))
    spark = get_spark(master=f"local[{cpus}]")

    docs = _tp(spark, sf_dir, "documents")
    bench = docs.filter(F.pmod(F.col("doc_id"), F.lit(100)) < 2)
    train = docs.filter(F.pmod(F.col("doc_id"), F.lit(100)) >= 2)
    weights = {f"src{i}": 0.05 for i in range(20)}
    # token budget scales with the corpus so mixing keeps a similar rate
    # shape at every SF (15k tokens against the canonical ~27k-token corpus)
    n_tok_total = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0] or 0
    budget = max(15_000, int(n_tok_total * 0.55))

    # PIPE_E2E_TOKENIZER=bpe measures the composition with the BPE
    # counter driving every budget-bearing stage (the corpus_pipeline_bpe
    # graded shape) — the extra cost is the pure-JVM fold of replaces
    tokenizer = None
    if os.environ.get("PIPE_E2E_TOKENIZER") == "bpe":
        from sri2db_spark.functions.tokenize import bpe_tokenizer  # noqa: PLC0415

        tokenizer = bpe_tokenizer()

    t_all = time.time()
    manifest, stages = curate_full(
        train, bench, weights=weights, budget_tokens=budget,
        return_stages=True, tokenizer=tokenizer,
    )
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    # curate_full materializes eagerly inside (hit-set localCheckpoint, the
    # packing prefix sum, the calibration frame) — attribute that up front
    timings["construct_eager"] = round(time.time() - t_all, 3)
    prev = time.time()
    for name, frame in stages.items():
        # stage frames share upstream work through curate_full's internal
        # materializations (hit-set/pack checkpoints); counting in order
        # attributes each boundary's incremental cost
        rows[name] = frame.count()
        timings[name] = round(time.time() - prev, 3)
        prev = time.time()

    # write the final artifacts through the committer + plain parquet
    out_dir = os.path.join(out_root, "packed")
    man_dir = os.path.join(out_root, "shards")
    t0 = time.time()
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "batch_id=0"))
    from sri2db_spark.functions.layout import shard_manifest  # noqa: PLC0415

    shard_manifest(manifest, "uid", 16, size_col="n_tokens").write.mode(
        "overwrite"
    ).parquet(man_dir)
    timings["write_artifacts"] = round(time.time() - t0, 3)

    # doctor every artifact written
    from sri2db_spark.functions.doctor import check_batch_output  # noqa: PLC0415

    t0 = time.time()
    rep = check_batch_output(out_dir)
    timings["doctor"] = round(time.time() - t0, 3)

    # deterministic manifest hash (order-insensitive): xor-ish via sorted rows
    hsh = hashlib.md5()
    for r in sorted(
        spark.read.parquet(os.path.join(out_dir, "batch_id=0")).collect()
    ):
        hsh.update(repr(tuple(r)).encode())
    total = round(time.time() - t_all, 3)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": int(cpus),
                "budget_tokens": budget,
                "total_sec": total,
                "stages": timings,
                "rows": rows,
                "doctor_healthy": rep.get("healthy", not rep["issues"]),
                "doctor_issues": rep["issues"],
                "manifest_hash": hsh.hexdigest(),
            }
        )
    )
    if not keep_out:
        shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
