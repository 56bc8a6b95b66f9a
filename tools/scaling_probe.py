#!/usr/bin/env python
"""Scaling probe: measure headline corpus operators at 1x and Nx the sf0.1
documents table and report the time ratio vs the ideal linear ratio.

The Nx corpus is the sf0.1 table replicated with offset doc_ids and a
per-copy suffix token appended to the text (so near-dup structure stays
realistic instead of creating N-way exact duplicates that would put the
whole corpus into one LSH bucket). A sub-linear-or-linear ratio is the
evidence that the operator's shuffle/aggregation structure survives a
scale-up; a super-linear ratio flags a quadratic candidate blowup.

Usage: python tools/scaling_probe.py [N]   (default N=10)
Prints one JSON line: {"n": N, "ops": {name: {"t1": s, "tn": s,
"ratio": tn/t1, "linear": N}}}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from sri2db_spark.functions import dedup as D  # noqa: E402
from sri2db_spark.functions import text as X  # noqa: E402
from sri2db_spark.session import get_spark  # noqa: E402


def ops(docs):
    return {
        "dedup_exact": lambda: D.exact_dedup(docs, "doc_id", "text"),
        "dedup_minhash_lsh": lambda: D.minhash_lsh_pairs(docs, "doc_id", "text"),
        "segment_dedup": lambda: X.segment_dedup_stats(docs, "doc_id", "text"),
        "bm25_topk": lambda: X.bm25_topk(
            docs, "doc_id", "text", ("spark", "merge", "window")
        ),
        "text_quality": lambda: X.add_text_features(docs, "text"),
    }


def time_op(fn) -> float:
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = base.count()
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytoken{i}")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(n)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    # materialize BOTH corpora the same way (same partition count, same
    # file-based input) so the ratio measures the operator, not the layout
    tmp = tempfile.mkdtemp(prefix="scaling_probe_")
    par = spark.sparkContext.defaultParallelism
    base_path = os.path.join(tmp, "documents_1x.parquet")
    base.repartition(par).write.parquet(base_path)
    base = spark.read.parquet(base_path)
    big_path = os.path.join(tmp, "documents_big.parquet")
    big.repartition(par).write.parquet(big_path)
    big_docs = spark.read.parquet(big_path)
    print(
        f"# corpus: {n_docs} docs at 1x, {big_docs.count()} at {n}x",
        file=sys.stderr,
    )

    report = {}
    for name in ops(base):
        time_op(ops(base)[name])  # warmup: codegen compile
        t1 = min(time_op(ops(base)[name]) for _ in range(2))
        tn = min(time_op(ops(big_docs)[name]) for _ in range(2))
        report[name] = {
            "t1": round(t1, 3),
            "tn": round(tn, 3),
            "ratio": round(tn / t1, 2),
            "linear": n,
        }
        print(f"# {name}: {t1:.2f}s -> {tn:.2f}s (x{tn / t1:.1f})", file=sys.stderr)

    print(json.dumps({"n": n, "sf_dir": sf_dir, "ops": report}))


if __name__ == "__main__":
    main()
