#!/usr/bin/env python
"""Store-size-independence probe for the incremental near-dup path.

The central claim of the incremental-state layer is O(batch), not
O(corpus): a fixed ingest batch must cost the same against a 1× signature
store as against an N× store, because the store side is broadcast-
semi-filtered to the batch's touched buckets BEFORE any join
(`functions/dedup.py`, machine-guarded in
`tests/test_plan_quality.py::test_incremental_neardup_store_side_never_shuffles`).
This probe measures it instead of just asserting the plan shape: it
signatures N× corpus copies into a store, then times the SAME batch at
each store size. ratio ≈ 1 is the evidence; ratio ≈ N would mean the
batch pays for the corpus.

Usage: python tools/incremental_probe.py [N]      (default 20)
Prints one JSON line:
{"n": N, "batch_docs": B, "t_store_1x": s, "t_store_nx": s, "ratio": r}
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
from sri2db_spark.session import get_spark  # noqa: E402


def _expand(base, n: int):
    """N disjoint near-dup universes (same interleave trick as
    tools/scaling_probe.py — cross-copy Jaccard collapses, within-copy
    structure is preserved)."""
    copies = []
    for i in range(n):
        token = F.lit(f"copytoken{i}")
        copies.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.flatten(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.array(w, token),  # noqa: B023
                        )
                    ),
                ).alias("text"),
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    return big


def _time_batch(spark, store, batch, lookup) -> float:
    t0 = time.perf_counter()
    D.incremental_neardup_pairs(
        spark, store, batch, lookup, "doc_id", "text", update_store=False
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="incremental_probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="incr_probe_")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # the fixed ingest batch: a fresh universe that is NOT in any store
    batch_src = _expand(base, 1).limit(200)
    batch = batch_src.select(
        (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
        F.concat_ws(" ", F.lit("batchtoken"), F.col("text")).alias("text"),
    )
    batch.write.parquet(f"{tmp}/batch.parquet")
    batch = spark.read.parquet(f"{tmp}/batch.parquet")
    n_batch = batch.count()

    report = {"n": n, "batch_docs": n_batch}
    for label, mult in (("1x", 1), (f"{n}x", n)):
        corpus = _expand(base, mult)
        corpus.write.parquet(f"{tmp}/corpus_{label}.parquet")
        corpus = spark.read.parquet(f"{tmp}/corpus_{label}.parquet")
        store = f"{tmp}/store_{label}"
        D.write_signature_store(corpus, "doc_id", "text", store)
        n_store = spark.read.parquet(store).count()
        lookup = corpus.unionByName(batch)
        _time_batch(spark, store, batch, lookup)  # warmup (codegen)
        t = min(_time_batch(spark, store, batch, lookup) for _ in range(3))
        report[f"t_store_{label}"] = round(t, 3)
        print(
            f"# store {label}: {n_store} sigs, batch of {n_batch} in {t:.2f}s",
            file=sys.stderr,
        )
    report["ratio"] = round(
        report[f"t_store_{n}x"] / report["t_store_1x"], 2
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
