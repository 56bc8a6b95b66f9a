"""Scale probe: compact_zordered cost vs table size at constant overlap.

The 100 TB claim behind SURVEY §7.12's minor compaction is that a
re-cluster's WRITE cost is O(overlapping generations), not O(table): the
generation stat rectangles select which generations merge, and every file
of a range-disjoint generation ships as a carry reference. This probe
builds a zordered table with G range-DISJOINT "cold" generations
(time-partitioned ingest shape, constant rows each) plus 3 range-
OVERLAPPING "hot" generations of fixed size, runs ``compact_zordered``,
and prints one JSON line per G with:

- ``merged_files`` / ``carried_files``: merged stays ~flat (the 3 hot
  generations) while carried grows with G — the O(overlap) signal;
- ``compact_s``: wall time (quiet machine only; the file counts are the
  deterministic signal);
- ``scan_rows``: a post-compaction full read, proving nothing was lost.

Run: ``python tools/zorder_compact_probe.py`` (env ``PROBE_GENS`` to
override, e.g. ``4,16,64``).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from sri2db_spark.functions.layout import (  # noqa: E402
    append_zordered,
    compact_zordered,
    read_skipping,
    write_zordered,
)
from sri2db_spark.session import get_spark  # noqa: E402
from sri2db_spark.sinks.committer import ManifestCommitter  # noqa: E402

ROWS_PER_GEN = 5_000
HOT_GENS = 3


def _gen(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 101).cast("bigint").alias("v"),
    )


def probe(spark, n_cold: int) -> dict:
    mc = ManifestCommitter(keep_versions=0)
    tmp = tempfile.mkdtemp(prefix="zc_probe_")
    path = os.path.join(tmp, "t")
    try:
        # cold generations: disjoint key ranges (time-partitioned shape)
        write_zordered(
            _gen(spark, 0, ROWS_PER_GEN), path, ["k", "v"], n_files=2,
            committer=mc,
        )
        for g in range(1, n_cold):
            lo = g * ROWS_PER_GEN
            append_zordered(
                _gen(spark, lo, lo + ROWS_PER_GEN), path, ["k", "v"],
                n_files=2, committer=mc,
            )
        # hot generations: all overlap the FIRST cold generation's range
        for _ in range(HOT_GENS):
            append_zordered(
                _gen(spark, 0, ROWS_PER_GEN), path, ["k", "v"], n_files=2,
                committer=mc,
            )
        t0 = time.perf_counter()
        rep = compact_zordered(spark, path, committer=mc, min_depth=3)
        compact_s = round(time.perf_counter() - t0, 3)
        total = read_skipping(
            spark, path, {"k": (None, None)}, committer=mc
        ).count()
        return {
            "cold_generations": n_cold,
            "merged_files": rep["merged_files"],
            "carried_files": rep["carried_files"],
            "generations_merged": rep["generations_merged"],
            "compact_s": compact_s,
            "scan_rows": total,
            "expected_rows": (n_cold + HOT_GENS) * ROWS_PER_GEN,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sizes = [int(s) for s in os.environ.get("PROBE_GENS", "4,16,64").split(",")]
    spark = get_spark(master="local[8]")
    for n in sizes:
        print(json.dumps(probe(spark, n)))
    spark.stop()


if __name__ == "__main__":
    main()
