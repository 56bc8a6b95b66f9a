#!/usr/bin/env python
"""Scaling probe: measure headline corpus operators at 1x and Nx the sf0.1
tables and report the time ratio vs the ideal linear ratio.

Expansion generator: the base table replicated N times with offset ids and
a per-copy token INTERLEAVED into the text after every word. Interleaving
(rather than a suffix) keeps each copy a disjoint near-dup universe: pairs
within a copy keep their shingle-Jaccard exactly (the transform is uniform
inside a copy), while cross-copy Jaccard collapses to ~0 because every
shingle carries the copy token. That models the realistic 100 TB shape —
near-dup density is a property of the data, not of corpus size — whereas a
suffix token makes all N copies of a doc mutual near-dups and manufactures
an N²/2 pair blowup no algorithm could (or should) absorb.

Embedding ops expand the embeddings table instead: N copies with offset ids
and a tiny per-copy shift on the first component (keeps vectors distinct
without changing the space's shape). ``ivfpq_query`` times the QUERY path
only, against an index built once per scale — the serving regime.

A sub-linear-or-linear ratio is the evidence that the operator's
shuffle/aggregation structure survives a scale-up; a super-linear ratio
flags a quadratic candidate blowup.

Usage: python tools/scaling_probe.py [N] [op1,op2,...]   (default N=10, all)
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
from sri2db_spark.functions import similarity as S  # noqa: E402
from sri2db_spark.functions import text as X  # noqa: E402
from sri2db_spark.session import get_spark  # noqa: E402

DOC_OPS = {
    "dedup_exact": lambda docs: D.exact_dedup(docs, "doc_id", "text"),
    "dedup_minhash_lsh": lambda docs: D.minhash_lsh_pairs(docs, "doc_id", "text"),
    "dedup_survivors": lambda docs: D.dedup_survivors(
        docs, D.minhash_lsh_pairs(docs, "doc_id", "text"), "doc_id"
    ),
    "segment_dedup": lambda docs: X.segment_dedup_stats(docs, "doc_id", "text"),
    "bm25_topk": lambda docs: X.bm25_topk(
        docs, "doc_id", "text", ("spark", "merge", "window")
    ),
    "text_quality": lambda docs: X.add_text_features(docs, "text"),
}
EMB_OPS = ("ivfpq_query",)


def _interleave_token(text_col, token: str):
    """Insert ``token`` after every word — uniform inside a copy, so
    within-copy Jaccard is preserved and cross-copy Jaccard collapses."""
    return F.concat_ws(
        " ",
        F.flatten(
            F.transform(
                F.split(text_col, " "), lambda w: F.array(w, F.lit(token))
            )
        ),
    )


def _expand_docs(base, n: int):
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            _interleave_token(F.col("text"), f"copytoken{i}").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(n)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    return big


def _expand_emb(base, n: int):
    copies = [
        base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.concat(
                F.array((F.element_at("embedding", 1) + F.lit(i * 1e-4))),
                F.slice("embedding", 2, 100_000),
            ).alias("embedding"),
        )
        for i in range(n)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    return big


def _materialize(spark, df, path: str):
    par = spark.sparkContext.defaultParallelism
    df.repartition(par).write.parquet(path)
    return spark.read.parquet(path)


def time_op(fn) -> float:
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _time_ivfpq_query(spark, emb, idx_dir: str) -> float:
    """Index built once (amortized retrain cost); time the 64-query serving
    path — probed-cell pruning + code-only ADC."""
    if not os.path.exists(idx_dir):
        S.build_ivfpq_index(emb, idx_dir, nlist=16, m=4, ksub=16, pq_iters=1)
    queries = emb.filter(F.col("vec_id") < 64)

    def q():
        return S.ivfpq_query_index(spark, idx_dir, queries, k=5, nprobe=4)

    time_op(q)  # warmup
    return min(time_op(q) for _ in range(2))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    selected = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scaling_probe_")

    doc_ops = {
        k: v for k, v in DOC_OPS.items() if selected is None or k in selected
    }
    want_emb = selected is None or any(o in selected for o in EMB_OPS)

    report = {}
    if doc_ops:
        base = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = base.count()
        # materialize BOTH corpora the same way — same partition count, same
        # file-based input, and the SAME interleave transform on the 1x side
        # (expand with n=1), so per-doc text length is identical at both
        # scales and the ratio measures the operator, not the layout
        docs_1x = _materialize(
            spark, _expand_docs(base, 1), os.path.join(tmp, "docs_1x.parquet")
        )
        docs_nx = _materialize(
            spark, _expand_docs(base, n), os.path.join(tmp, "docs_nx.parquet")
        )
        print(
            f"# docs: {n_docs} at 1x, {docs_nx.count()} at {n}x",
            file=sys.stderr,
        )
        for name, op in doc_ops.items():
            time_op(lambda: op(docs_1x))  # warmup: codegen compile
            t1 = min(time_op(lambda: op(docs_1x)) for _ in range(2))
            tn = min(time_op(lambda: op(docs_nx)) for _ in range(2))
            report[name] = {
                "t1": round(t1, 3),
                "tn": round(tn, 3),
                "ratio": round(tn / t1, 2),
                "linear": n,
            }
            print(
                f"# {name}: {t1:.2f}s -> {tn:.2f}s (x{tn / t1:.1f})",
                file=sys.stderr,
            )

    if want_emb:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        emb_1x = _materialize(spark, emb, os.path.join(tmp, "emb_1x.parquet"))
        emb_nx = _materialize(
            spark, _expand_emb(emb, n), os.path.join(tmp, "emb_nx.parquet")
        )
        print(
            f"# embeddings: {emb_1x.count()} at 1x, {emb_nx.count()} at {n}x",
            file=sys.stderr,
        )
        t1 = _time_ivfpq_query(spark, emb_1x, os.path.join(tmp, "idx_1x"))
        tn = _time_ivfpq_query(spark, emb_nx, os.path.join(tmp, "idx_nx"))
        report["ivfpq_query"] = {
            "t1": round(t1, 3),
            "tn": round(tn, 3),
            "ratio": round(tn / t1, 2),
            "linear": n,
        }
        print(f"# ivfpq_query: {t1:.2f}s -> {tn:.2f}s (x{tn / t1:.1f})", file=sys.stderr)

    print(json.dumps({"n": n, "sf_dir": sf_dir, "ops": report}))


if __name__ == "__main__":
    main()
