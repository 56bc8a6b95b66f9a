"""Scale probe: right-to-be-forgotten cost vs artifact size (SURVEY §7.11).

The claim is that each RTBF operation is O(touched), not O(artifact):

- ``retract_from_output`` against a batch-id-addressed output with N
  batch dirs: retracting 2 ids living in 2 dirs must REWRITE ~2 dirs
  (fold into one negative-token base) while N-2 dirs stay byte-identical;
- ``ann_index_delete`` against an IVF index with N cells: deleting 3
  vectors must rewrite only the ≤3 cell partitions that hold them.

Prints one JSON line per size with the deterministic signals (dirs/cells
rewritten vs total) plus wall time (meaningful only on a quiet machine).

Run: ``python tools/rtbf_scale_probe.py`` (env ``PROBE_SIZES``, e.g.
``8,32,128`` for output batch counts; index nlist scales as size/2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import sri2db_spark.functions.similarity as S  # noqa: E402
from sri2db_spark.functions import pipeline as P  # noqa: E402
from sri2db_spark.session import get_spark  # noqa: E402

ROWS_PER_BATCH = 500
DIM = 16


def _census(root):
    out = {}
    for dirpath, _d, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_mtime_ns, st.st_size)
    return out


def probe_output(spark, n_batches: int) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"rtbf_out_{n_batches}_")
    out = os.path.join(tmp, "out")
    try:
        for b in range(n_batches):
            lo = b * ROWS_PER_BATCH
            spark.range(lo, lo + ROWS_PER_BATCH).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("text "), F.col("id")).alias("text"),
            ).coalesce(1).write.parquet(f"{out}/batch_id={b}")
        before = _census(out)
        # 2 ids, each in a different batch dir
        victims = [3, ROWS_PER_BATCH * (n_batches // 2) + 7]
        t0 = time.time()
        n = P.retract_from_output(spark, out, victims)
        wall = time.time() - t0
        assert n == 2, n
        after = _census(out)
        untouched_tops = {
            r.split(os.sep)[0]
            for r, sig in after.items()
            if before.get(r) == sig
        }
        rewritten = (
            n_batches
            + 1
            - len({t for t in untouched_tops if t.startswith("batch_id=")})
        )
        total_rows = spark.read.parquet(out).count()
        assert total_rows == n_batches * ROWS_PER_BATCH - 2
        return {
            "kind": "output",
            "batches": n_batches,
            "dirs_rewritten": rewritten,
            "retract_s": round(wall, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_index(spark, nlist: int) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"rtbf_idx_{nlist}_")
    try:
        n_vec = nlist * 200
        vecs = spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    ((F.col("id") * (i + 3)) % 97 / 97.0).cast("float")
                    for i in range(DIM)
                ]
            ).alias("embedding"),
        )
        S.build_ivf_index(vecs, tmp, nlist=nlist)
        cells = os.path.join(tmp, "cells")
        before = _census(cells)
        t0 = time.time()
        n = S.ann_index_delete(spark, tmp, [1, n_vec // 2, n_vec - 2])
        wall = time.time() - t0
        assert n == 3, n
        after = _census(cells)
        untouched = {
            r.split(os.sep)[0]
            for r, sig in after.items()
            if before.get(r) == sig
        }
        total_cells = {r.split(os.sep)[0] for r in before}
        return {
            "kind": "index",
            "cells": len(total_cells),
            "cells_rewritten": len(total_cells - untouched),
            "delete_s": round(wall, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sizes = [
        int(s)
        for s in os.environ.get("PROBE_SIZES", "8,32,128").split(",")
    ]
    spark = get_spark(app_name="rtbf_scale_probe")
    for n in sizes:
        print(json.dumps(probe_output(spark, n)), flush=True)
    for n in sizes:
        print(json.dumps(probe_index(spark, max(4, n // 2))), flush=True)


if __name__ == "__main__":
    main()
