#!/usr/bin/env python
"""Pin the source of the dedup_minhash_lsh / ngram_topk bench bimodality
(3.0 <-> 4.1 s across rounds on byte-identical code, swing > reported IQR).

Runs one query N times on a warm session with the exact bench.py
discipline (clearCache between runs, untimed warmup first) and records,
per run: wall time, JVM GC time delta, executor-run-time delta, and
shuffle metrics — so "GC pause" vs "shuffle-file reuse" vs "codegen
warm-up" stops being a guess.

Usage: python tools/bench_bimodality_probe.py [query] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sri2db_spark.plans.analytics import QUERIES, _t  # noqa: E402
from sri2db_spark.session import get_spark  # noqa: E402


def gc_millis(spark) -> int:
    beans = (
        spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    )
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def jit_millis(spark) -> int:
    return (
        spark._jvm.java.lang.management.ManagementFactory.getCompilationMXBean()
        .getTotalCompilationTime()
    )


def main() -> None:
    query = sys.argv[1] if len(sys.argv) > 1 else "dedup_minhash_lsh"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

    spark = get_spark(app_name="bimodality_probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("documents",):
        _t(spark, sf_dir, t).count()

    fn = QUERIES[query]
    spark.catalog.clearCache()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup

    rows = []
    for i in range(repeats):
        spark.catalog.clearCache()
        gc0, jit0 = gc_millis(spark), jit_millis(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        gc1, jit1 = gc_millis(spark), jit_millis(spark)
        rows.append(
            {
                "run": i,
                "wall_s": round(wall, 3),
                "gc_ms": gc1 - gc0,
                "jit_ms": jit1 - jit0,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    walls = sorted(r["wall_s"] for r in rows)
    print(
        json.dumps(
            {
                "query": query,
                "min": walls[0],
                "median": walls[len(walls) // 2],
                "max": walls[-1],
                "spread_iqr": round(
                    walls[(3 * len(walls)) // 4] - walls[len(walls) // 4], 3
                ),
                "gc_ms_per_run": [r["gc_ms"] for r in rows],
                "corr_note": "compare wall_s ranking vs gc_ms ranking",
            }
        )
    )


if __name__ == "__main__":
    main()
