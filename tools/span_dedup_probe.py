"""Scale probe: substring-level dedup cost vs corpus size.

The 100 TB claim behind ``duplicated_spans`` / ``duplicated_span_coverage``
(functions/text.py) is that the cost is LINEAR in total tokens — one
explode to ~tokens rows, one map-side-combined (gram, id) aggregation
(Spark plans the distinct as a two-level hash agg keyed (gram, id), which
also SPREADS hot boilerplate grams across partitions instead of funneling
them to one reducer), and a co-partitioned join back for the coverage
interval union. Nothing is quadratic in documents and nothing collects to
the driver.

This probe synthesizes corpora of growing document counts (48 filler
tokens per doc, plus a fixed 12-token boilerplate paragraph planted in
10% of docs so the duplicated-occurrence population scales too), runs
both operators, and prints one JSON line per size with:

- ``docs`` / ``tokens``: corpus size;
- ``dup_grams`` / ``covered_docs``: output sizes (the planted signal);
- ``spans_s`` / ``coverage_s``: wall time — the per-token rate
  (``us_per_token``) should stay ~flat as docs grow 16x, the linearity
  signal (quiet machine only; the output counts are deterministic).

Run: ``python tools/span_dedup_probe.py`` (env ``PROBE_DOCS`` to override,
e.g. ``2000,8000,32000``).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from sri2db_spark.functions.text import (  # noqa: E402
    duplicated_span_coverage,
    duplicated_spans,
)
from sri2db_spark.session import get_spark  # noqa: E402

FILLER_TOKENS = 48
BOILERPLATE = " ".join(f"bp{i}" for i in range(12))  # a 12-token paragraph


def corpus(spark, n_docs: int):
    # deterministic unique filler + the boilerplate planted in 10% of docs
    filler = F.concat_ws(
        " ",
        *[
            # modulus far above id*31's range so filler never collides
            # across docs — the planted boilerplate is the ONLY dup signal
            F.concat(F.lit(f"w{j}_"), (F.col("id") * 31 + j) % 100000007)
            for j in range(FILLER_TOKENS)
        ],
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0, F.concat_ws(" ", filler, F.lit(BOILERPLATE))
        )
        .otherwise(filler)
        .alias("text"),
    )


def main() -> None:
    sizes = [
        int(s)
        for s in os.environ.get("PROBE_DOCS", "2000,8000,32000").split(",")
    ]
    spark = get_spark(app_name="span_dedup_probe", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()  # JVM warm-up
    for n in sizes:
        docs = corpus(spark, n).repartition(8).localCheckpoint(eager=True)
        # exact token count, closed-form from the generator (boilerplate
        # docs are 12 tokens longer than filler-only ones — a nominal
        # per-doc constant would overstate the corpus ~22%); arithmetic
        # instead of a Spark pass so the untimed scan cannot warm caches
        # differently across sizes
        tokens = FILLER_TOKENS * n + 12 * ((n + 9) // 10)
        t0 = time.perf_counter()
        dup_grams = duplicated_spans(docs, "doc_id", "text", w=8).count()
        spans_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        covered = (
            duplicated_span_coverage(docs, "doc_id", "text", w=8)
            .filter(F.col("dup_tokens") > 0)
            .count()
        )
        coverage_s = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "docs": n,
                    "tokens": tokens,
                    "dup_grams": dup_grams,
                    "covered_docs": covered,
                    "spans_s": round(spans_s, 3),
                    "coverage_s": round(coverage_s, 3),
                    "us_per_token": round(
                        1e6 * (spans_s + coverage_s) / tokens, 2
                    ),
                },
                separators=(",", ":"),
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
