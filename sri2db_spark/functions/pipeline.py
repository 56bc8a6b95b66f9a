"""End-to-end corpus curation: the composed training-data pipeline.

The individual operators (quality scoring, dedup, decontamination,
sampling) each have a registry query; this module wires them into the
standard curation chain a 100 TB pretraining pipeline runs:

    quality filter → exact dedup → benchmark decontamination
                   → stratified sampling → token accounting

Composition is deliberately pure-DataFrame: the whole chain stays one
lazy plan, so Catalyst pushes the quality filter into the scan, reuses
the corpus scan across stages where possible, and the only shuffles are
the two the semantics require (the dedup hash-agg and the
decontamination probe-side aggregation). Every stage is deterministic,
so the full pipeline output is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import (
    ngram_overlap_contamination,
    quality_score,
    stratified_sample,
    token_count_ws,
)


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    min_quality: float = 0.24,
    contamination_k: int = 5,
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 50,
) -> DataFrame:
    """The curated corpus: (id, strata, n_tokens, quality) for every
    surviving document.

    Stages (each drops rows, none reorders — set semantics throughout):

    1. **Quality filter** — ``quality_score ≥ min_quality``; a codegen
       predicate evaluated in the scan stage.
    2. **Exact dedup, first-id-wins** — one hash-aggregation on
       ``md5(text)`` keeps the minimum id per distinct content; survivors
       re-selected with a semi-join on id (build side = one row per
       distinct content, the small side after dedup).
    3. **Benchmark decontamination** — any doc sharing ≥1 k-word shingle
       with the benchmark set is dropped (broadcast shingle probe,
       :func:`ngram_overlap_contamination`).
    4. **Stratified sampling** — per-stratum deterministic ``id %% 100``
       rates (the data-mixing knob).
    5. **Token accounting** — whitespace token counts for downstream
       packing/budgeting.
    """
    scored = docs.withColumn("quality", quality_score(F.col(text_col))).filter(
        F.col("quality") >= min_quality
    )
    reps = scored.groupBy(F.md5(F.col(text_col)).alias("__h")).agg(
        F.min(id_col).alias(id_col)
    ).select(id_col)
    deduped = scored.join(reps, id_col, "left_semi")
    contaminated = ngram_overlap_contamination(
        deduped, benchmark, id_col, text_col, k=contamination_k
    ).select(id_col)
    clean = deduped.join(contaminated, id_col, "left_anti")
    sampled = stratified_sample(
        clean, id_col, strata_col, rates_pct or {}, default_pct=default_pct
    )
    return sampled.select(
        id_col,
        strata_col,
        token_count_ws(F.col(text_col)).alias("n_tokens"),
        "quality",
    )
