"""Iterative graph analytics over edge-list DataFrames.

The reference engine has no graph operators; these extend the 100 TB
pipeline surface (domain authority ranking for web-corpus curation is the
canonical use: rank source domains by link structure, then weight sampling
by rank). The only iterative operator shipped so far was min-label
propagation (``functions.dedup.connected_components``); PageRank is the
other classic whose Spark shape — per-iteration shuffle join + aggregate
with lineage truncation — a 1000-executor deployment needs.

Determinism: ranks are fixed-point integers (``rank_e12``, 10^12 = rank
1.0 split across nodes), contributions are exact integer divisions, and
per-node inflow is an exact BIGINT sum — so the result is bit-identical
at any parallelism and replayable by any engine with 64-bit integer
arithmetic (the DuckDB oracle unrolls the same iterations in SQL).
Classical double-typed PageRank sums floats in partition order and is NOT
reproducible across engines; the fixed-point form loses < 10^-12 of mass
per division, far below any ranking-relevant signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 4,
    dedup_edges: bool = True,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Returns ``(node_id, rank_e12)`` for every node that appears as a
    source (callers that need dangling nodes ranked should add reverse
    or self edges first — the bipartite registry entry adds reverses).

    rank'(v) = ((100-d)·(S div N)) div 100 + (d·Σ_{u→v} (rank(u) div
    outdeg(u))) div 100, with S = 10^12, all divisions integer.

    Plan per iteration: one shuffle join (edges ⋈ ranks on src — ranks is
    O(nodes), edges O(edges)) + one map-side-combined aggregation on dst.
    ``localCheckpoint`` every ``checkpoint_every`` iterations truncates
    lineage the same way ``connected_components`` does — without it the
    logical plan nests one join per iteration and driver-side planning
    blows up long before the executors do. Out-degrees are computed once
    and folded into the rank frame, so the static edge list is the only
    persisted dataset.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if dedup_edges:
        # duplicate edges would double-count contributions; callers whose
        # edge list is distinct by construction pass dedup_edges=False and
        # save a full edge-sized shuffle
        e = e.distinct()
    # hash-partition the (big) edge list by the join key ONCE before
    # caching: the cached plan's outputPartitioning satisfies every
    # iteration's join distribution, so only the O(nodes) rank side
    # shuffles per iteration — without this, the edge list re-shuffles
    # every iteration (the dominant cost at web-graph scale)
    e = e.repartition("src").persist()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # 1-row node count, folded in as a column (lazy; no driver collect)
    n_nodes = outdeg.agg(F.count(F.lit(1)).alias("__n"))
    base = F.expr(f"{RANK_SCALE} div __n")
    teleport = F.expr(f"({100 - damping_pct} * ({RANK_SCALE} div __n)) div 100")
    ranks = (
        outdeg.crossJoin(F.broadcast(n_nodes))
        .select("src", "od", base.alias("r"), teleport.alias("tp"))
    ).localCheckpoint(eager=True)
    for i in range(iters):
        contrib = (
            e.alias("e")
            .join(ranks.alias("rk"), F.col("e.src") == F.col("rk.src"))
            .select(F.col("e.dst").alias("node"), F.expr("r div od").alias("c"))
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        # every ranked node keeps its static od/tp columns; nodes with no
        # inflow (impossible once reverse edges exist, but cheap to keep
        # correct) coalesce to 0
        nxt = (
            ranks.join(inflow, ranks["src"] == inflow["node"], "left")
            .select(
                "src",
                "od",
                "tp",
                (
                    F.col("tp")
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            nxt = nxt.localCheckpoint(eager=True)
        ranks = nxt
    e.unpersist()
    return ranks.select(F.col("src").alias("node_id"), F.col("r").alias("rank_e12"))
