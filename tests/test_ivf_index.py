"""Persisted IVF index (functions/similarity.build_ivf_index /
ivf_query_index): build-once/query-many equals the inline operator, and the
cid-partitioned cell layout actually prunes at the file level."""

from __future__ import annotations

import contextlib
import io
import os
import tempfile

import pytest
from pyspark.sql import functions as F

import sri2db_spark.functions.similarity as S
from sri2db_spark.plans.analytics import _tp

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark):
    emb = _tp(spark, SF, "embeddings")
    tmp = tempfile.mkdtemp(prefix="ivf_test_")
    S.build_ivf_index(emb, tmp, nlist=16)
    yield emb, tmp
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def test_layout_on_disk(index):
    _, tmp = index
    cells = os.path.join(tmp, "cells")
    cids = sorted(d for d in os.listdir(cells) if d.startswith("cid="))
    assert len(cids) >= 2  # multiple cells materialized as directories
    assert os.path.isdir(os.path.join(tmp, "centroids"))


def test_saved_index_equals_inline_operator(spark, index):
    emb, tmp = index
    queries = emb.filter(F.col("vec_id") < 8)
    inline = S.ivf_ann_topk(emb, queries, k=5, nlist=16, nprobe=4)
    saved = S.ivf_query_index(spark, tmp, queries, k=5, nprobe=4)
    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, saved.collect()))
    assert a == b  # float round-trip through parquet is bit-exact


def test_query_prunes_cells_dynamically(spark, index):
    """The probe->cells join is on the partition column with a broadcast
    probe side, so Spark must inject a dynamic-partition-pruning subquery:
    only the probed cid directories are read."""
    emb, tmp = index
    out = S.ivf_query_index(spark, tmp, emb.filter(F.col("vec_id") < 2), k=3, nprobe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(True)
    assert "dynamicpruning" in buf.getvalue().lower()


def test_nprobe_caps_at_nlist(spark, index):
    emb, tmp = index
    out = S.ivf_query_index(spark, tmp, emb.filter(F.col("vec_id") < 2), k=3, nprobe=99)
    # probing every cell == exact search over the whole corpus
    exact = S.cosine_topk(emb, emb.filter(F.col("vec_id") < 2), k=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, exact.collect()))
