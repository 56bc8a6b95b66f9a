#!/usr/bin/env python
"""EVIDENCE-only merge-path scale probe: an N-resource sharded full sync
(default 20M — one decade past the bench's 2M HEADLINE entry) through the
SAME reader/sink stack (`SriApiReader` executor-side offset shards →
staged merge → `LakeTable`), against the pure-function `SyntheticSriApi`
so fixture construction costs nothing.

Purpose: confirm the ~60k rec/s the 2M entry holds keeps holding at 10x,
i.e. the staging/commit layer has no hidden super-linear step (watermark
CAS, manifest size, shard-count scheduling). Prints ONE JSON line:

  {"n": ..., "wall_sec": ..., "recs_per_sec": ..., "rows_after": ...,
   "shards": ..., "alpha_vs": {"n": ..., "wall_sec": ...}} — pass a
   comparison point via SYNC_PROBE_BASELINE='{"n":2000000,"wall_sec":33.4}'
   to get the fitted alpha (wall ~ n^alpha).

Usage: [SPARK_GRAFT_CPUS=32] python tools/sync_scale_probe.py [n]
"""
from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

    from sri2db_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark(app_name="sync_scale_probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addPyFile(os.path.join(REPO, "tests", "fake_api.py"))
    from fake_api import SyntheticSriApi  # noqa: PLC0415

    from sri2db_spark.model.schema import LAYOUT_LARGE  # noqa: PLC0415
    from sri2db_spark.operators.watermark import WatermarkStore  # noqa: PLC0415
    from sri2db_spark.sinks.lake import LakeTable  # noqa: PLC0415
    from sri2db_spark.sources.sri_api import SriApiReader  # noqa: PLC0415
    from sri2db_spark.sync.engine import Sri2DbSync  # noqa: PLC0415

    shard_size = 62_500  # same as the bench entry: plan stays identical
    tmp = tempfile.mkdtemp(prefix="sync_scale_probe_")
    api = SyntheticSriApi(n=n, page_size=5000)
    sync = Sri2DbSync(
        reader=SriApiReader(
            spark, "https://bench.local", fetch_json=api.fetch_json, limit=5000
        ),
        table=LakeTable(spark, os.path.join(tmp, "t"), LAYOUT_LARGE),
        path="/a",
        baseurl="https://bench.local",
        layout=LAYOUT_LARGE,
        watermarks=WatermarkStore(spark, os.path.join(tmp, "w")),
        full_sync_shard_size=shard_size,
    )
    t0 = time.perf_counter()
    res = sync.full_sync()
    wall = round(time.perf_counter() - t0, 3)
    assert res.rows_after == n, (res.rows_after, n)

    out = {
        "n": n,
        "cpus": int(cpus),
        "wall_sec": wall,
        "recs_per_sec": round(n / wall, 1),
        "rows_after": res.rows_after,
        "shards": math.ceil(n / shard_size),
    }
    base = os.environ.get("SYNC_PROBE_BASELINE")
    if base:
        b = json.loads(base)
        out["alpha_vs"] = {
            **b,
            "alpha": round(
                math.log(wall / b["wall_sec"]) / math.log(n / b["n"]), 3
            ),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
