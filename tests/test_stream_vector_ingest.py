"""Streaming vector ingest into a saved IVF index: arriving vectors become
queryable, cell layout stays pruned, and batch replay does not duplicate."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

import sri2db_spark.functions.similarity as S
from sri2db_spark.plans.analytics import _tp
from sri2db_spark.streaming.vector_ingest import stream_ivf_ingest

SF = "/root/testdata/sf0.001"

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _write_feed(feed_dir, name, rows, mtime):
    p = feed_dir / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    os.utime(p, (mtime, mtime))


def test_stream_ivf_ingest_and_replay(spark, tmp_path):
    emb = _tp(spark, SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    batch_rows = [
        {"vec_id": int(r.vec_id), "embedding": [float(x) for x in r.embedding]}
        for r in emb.filter(F.col("vec_id") % 5 == 0).limit(40).collect()
    ]
    idx = str(tmp_path / "idx")
    S.build_ivf_index(base, idx, nlist=8)
    n_before = spark.read.parquet(f"{idx}/cells").count()

    feed = tmp_path / "vfeed"
    feed.mkdir()
    _write_feed(feed, "b1.json", batch_rows, 1_000)

    def run(ckpt):
        stream = spark.readStream.schema(VEC_SCHEMA).json(str(feed))
        q = stream_ivf_ingest(stream, idx, str(tmp_path / ckpt))
        q.awaitTermination(120)

    run("ck1")
    cells = spark.read.parquet(f"{idx}/cells")
    assert cells.count() == n_before + len(batch_rows)
    # replay the SAME batch (fresh checkpoint -> same batch_id=0): dynamic
    # partition overwrite must land it idempotently, not duplicate it
    run("ck2")
    cells = spark.read.parquet(f"{idx}/cells")
    assert cells.count() == n_before + len(batch_rows)
    ids = [r.id for r in cells.select("id").collect()]
    assert len(ids) == len(set(ids))
    # streamed vectors are queryable: query one of them for its own
    # neighborhood and confirm results come back from its cell
    queries = emb.filter(F.col("vec_id") == batch_rows[0]["vec_id"])
    res = S.ivf_query_index(spark, idx, queries, k=3, nprobe=8)
    assert res.count() == 3
    # assignment matches the batch operator's math (argmin over centroids)
    streamed = {r.id: r.cid for r in cells.filter(F.col("batch_id") == 0).collect()}
    import numpy as np

    C = np.array(
        [r["centroid"] for r in spark.read.parquet(f"{idx}/centroids").orderBy("cid").collect()]
    )
    for row in batch_rows[:10]:
        v = np.array(row["embedding"], dtype=np.float64)
        d = ((C - v) ** 2).sum(axis=1)
        assert streamed[row["vec_id"]] == int(np.argmin(d))
