"""Hybrid retrieval: fuse ranked lists from heterogeneous retrievers.

Modern RAG stacks retrieve with BOTH a sparse scorer (BM25,
``functions.text.bm25_topk``) and a dense scorer (embedding cosine,
``functions.similarity.cosine_topk``) and merge via reciprocal-rank
fusion (RRF, Cormack et al. 2009): score(d) = Σ_lists 1/(k + rank_d).
RRF needs only ranks — no score calibration across retrievers — which is
why it is the default fusion in production hybrid search.

Scale shape: each input is already a top-N list (N rows per query, not
the corpus), so fusion is a join between two tiny frames — broadcast by
construction. The expensive work stays in the retrievers, which have
their own 100 TB plans (BM25: filtered explode + hash agg; ANN: pruned
IVF/PQ scans).

Determinism: 1/(k+rank) is one IEEE double division of exact integers,
and the two list contributions are added in fixed (a, b) order — the
fused scores are bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Fuse two ranked lists ``(id_col, rank_col)`` into a top-``k``.

    Returns ``(id, rank_a, rank_b, rrf_score, rank)``; an id present in
    only one list contributes 0.0 for the missing one (standard RRF).
    Ties break on id ascending so the cut is deterministic.
    """
    fa = a.select(F.col(id_col).alias("id"), F.col(rank_col).alias("rank_a"))
    fb = b.select(F.col(id_col).alias("id"), F.col(rank_col).alias("rank_b"))
    term_a = F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_a")).cast("double")
    term_b = F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_b")).cast("double")
    fused = fa.join(fb, "id", "full_outer").select(
        "id",
        "rank_a",
        "rank_b",
        (
            F.coalesce(term_a, F.lit(0.0)) + F.coalesce(term_b, F.lit(0.0))
        ).alias("rrf_score"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("id").asc())
    # orderBy+limit first (map-side top-k over an already-tiny frame), then
    # the k-row window assigns the final rank — same benign shape as
    # bm25_topk (the window sorts k rows, never the corpus)
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("id").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )
