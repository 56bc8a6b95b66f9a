#!/usr/bin/env python
"""ANN recall/cost probe: recall@5 vs wall time for every similarity-search
operator, against exact L2/cosine ground truth at $SPARK_GRAFT_SF_DIR
(default sf0.1). Evidence for the recall/latency trade each index buys:

    python tools/ann_recall_probe.py [n_queries]

Prints one JSON line: {"sf_dir": ..., "n_queries": N, "ops": {name:
{"recall_at_5": r, "sec": t}}}. Ground truth for cosine-ranking operators
(cosine/LSH/IVF/IVFFlat saved) is exact cosine top-5; for L2-ranking PQ
operators it is exact L2 top-5.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import sri2db_spark.functions.similarity as S  # noqa: E402
from sri2db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(app_name="ann_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") < n_q)

    data = {r.vec_id: np.array([float(x) for x in r.embedding]) for r in emb.collect()}
    qs = {i: data[i] for i in range(n_q) if i in data}
    M = np.stack(list(data.values()))
    ids = np.array(list(data.keys()))
    norms = np.linalg.norm(M, axis=1)
    exact_cos, exact_l2 = {}, {}
    for qid, qv in qs.items():
        cos = (M @ qv) / (norms * np.linalg.norm(qv))
        l2 = ((M - qv) ** 2).sum(axis=1)
        mask = ids != qid
        order_c = np.argsort(-cos[mask], kind="stable")
        order_l = np.argsort(l2[mask], kind="stable")
        exact_cos[qid] = set(ids[mask][order_c[:5]])
        exact_l2[qid] = set(ids[mask][order_l[:5]])

    def recall(rows, truth):
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return round(
            sum(len(truth[q] & v) for q, v in got.items()) / (5 * max(len(got), 1)), 3
        )

    out: dict[str, dict[str, float]] = {}

    def run(name, fn, truth):
        t0 = time.perf_counter()
        rows = fn().collect()
        dt = time.perf_counter() - t0
        out[name] = {"recall_at_5": recall(rows, truth), "sec": round(dt, 3)}

    run("cosine_exact", lambda: S.cosine_topk(emb, queries, k=5), exact_cos)
    run("lsh", lambda: S.lsh_ann_topk(emb, queries, k=5), exact_cos)
    run("ivf", lambda: S.ivf_ann_topk(emb, queries, k=5, nlist=16, nprobe=4), exact_cos)

    books = S.pq_train(emb, m=8, ksub=16, iters=2)
    codes = S.pq_encode(emb, books).cache()
    codes.count()
    run("pq_adc", lambda: S.pq_adc_topk(codes, books, queries, k=5), exact_l2)
    run(
        "pq_rerank",
        lambda: S.pq_adc_rerank_topk(emb, codes, books, queries, k=5, shortlist=50),
        exact_l2,
    )

    import shutil

    tmp = tempfile.mkdtemp(prefix="probe_ivfpq_")
    S.build_ivfpq_index(emb, tmp, nlist=16, m=8, ksub=16, pq_iters=2)
    run(
        "ivfpq",
        lambda: S.ivfpq_query_index(spark, tmp, queries, k=5, nprobe=4),
        exact_l2,
    )
    shutil.rmtree(tmp, ignore_errors=True)

    tmp = tempfile.mkdtemp(prefix="probe_ivfpqr_")
    S.build_ivfpq_index(emb, tmp, nlist=16, m=8, ksub=16, pq_iters=2, residual=True)
    run(
        "ivfpq_residual",
        lambda: S.ivfpq_query_index(spark, tmp, queries, k=5, nprobe=4),
        exact_l2,
    )
    run(
        "ivfpq_rerank50",
        lambda: S.ivfpq_query_index(
            spark, tmp, queries, k=5, nprobe=4, rerank_shortlist=50
        ),
        exact_l2,
    )
    shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({"sf_dir": sf_dir, "n_queries": n_q, "ops": out}))


if __name__ == "__main__":
    main()
