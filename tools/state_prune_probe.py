"""Scale probe: pruned state maintenance cost vs store file count.

The 100 TB claim behind SURVEY §7.9 is that a retraction's WRITE cost is
O(touched files) while the store grows: the base's per-file
``_PRUNE_STATS`` select the files whose id range can hold an affected
row, and everything else ships as a ``_CARRY`` reference. This probe
builds a curation state whose corpus base has N range-partitioned files
(constant rows per file), retracts 3 clustered ids, then folds two
appended batches with ``compact_curation_state(incremental=True)``, and
prints one JSON line per N with:

- ``rewritten`` / ``carried``: own files vs carry entries of the
  post-retraction base — rewritten should stay ~flat as N grows 8× while
  carried grows with N;
- ``retract_s`` / ``inc_compact_s``: wall time (only meaningful on a
  quiet machine — file counts are the deterministic signal);
- ``inc_rewritten`` / ``inc_carried``: same split after the incremental
  fold (own files = O(appended batches), carry = whole base).

Run: ``python tools/state_prune_probe.py`` (env ``PROBE_SIZES`` to
override, e.g. ``8,32,128``).
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

from sri2db_spark.functions import pipeline as P  # noqa: E402
from sri2db_spark.functions.statestore import (  # noqa: E402
    CARRY_MARKER,
    read_store,
    write_store_batch,
)
from sri2db_spark.session import get_spark  # noqa: E402
from sri2db_spark.sinks.committer import ManifestCommitter  # noqa: E402

ROWS_PER_FILE = 1000


def probe(spark, n_files: int) -> dict:
    mc = ManifestCommitter()
    fs = mc.fs
    root = tempfile.mkdtemp(prefix=f"prune_probe_{n_files}_")
    state = f"{root}/state"
    n = n_files * ROWS_PER_FILE
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("the quick brown fox document number "),
                F.col("id"),
                F.lit(" jumps over the lazy dog on the plain "),
                F.col("id"),
            ).alias("text"),
            F.lit("en").alias("lang"),
        )
        .repartitionByRange(n_files, "doc_id")
    )
    out: dict = {"n_files": n_files, "rows": n}
    try:
        P.init_curation_state(docs, state, committer=mc)
        corpus = f"{state}/corpus"
        assert len(fs.walk_files(mc.resolve(corpus))) == n_files

        # 3 clustered ids: at most one file's range is hit per store
        t0 = time.time()
        P.retract_from_state(spark, state, [7, 8, 9], committer=mc)
        out["retract_s"] = round(time.time() - t0, 2)
        base = mc.resolve(corpus)
        out["rewritten"] = len(fs.walk_files(base))
        out["carried"] = len(
            [
                ln
                for ln in fs.read(
                    os.path.join(base, CARRY_MARKER)
                ).splitlines()
                if ln
            ]
        )

        # two foldable appends + one replay-protected
        for token in (0, 1, 2):
            write_store_batch(
                spark.createDataFrame(
                    [(n + token, f"appended document {n + token}")],
                    "id long, text string",
                ),
                corpus,
                token=token,
                fs=fs,
            )
        t0 = time.time()
        P.compact_curation_state(spark, state, committer=mc, incremental=True)
        out["inc_compact_s"] = round(time.time() - t0, 2)
        base = mc.resolve(corpus)
        out["inc_rewritten"] = len(fs.walk_files(base))
        out["inc_carried"] = len(
            [
                ln
                for ln in fs.read(
                    os.path.join(base, CARRY_MARKER)
                ).splitlines()
                if ln
            ]
        )
        got = read_store(spark, corpus, committer=mc).count()
        # n docs - 3 retracted + 3 appended (one still a preserved batch)
        assert got == n, f"row loss: {got} != {n}"
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    sizes = [
        int(s)
        for s in os.environ.get("PROBE_SIZES", "8,32,128").split(",")
    ]
    spark = get_spark(app_name="state_prune_probe")
    for n_files in sizes:
        print(json.dumps(probe(spark, n_files)), flush=True)


if __name__ == "__main__":
    main()
