"""Probe: file-level data skipping (layout.write_zordered/read_skipping)
vs a plain full-directory filtered scan, as file count grows.

The scale argument: planning a range scan over a clustered table from
parquet footers costs one footer read PER FILE (one GET each on an object
store); the _FILE_STATS sidecar is ONE object read regardless of file
count, and Spark is handed only the overlapping files. This probe
measures, per file count N: files scanned / total, wall time of the
stats-pruned count, and wall time of the full-scan filtered count on the
same data and predicate. Results equal by construction (asserted).

Usage: python tools/skipping_probe.py [N ...]   (default: 16 64 256)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sri2db_spark.functions.layout import read_skipping, write_zordered
from sri2db_spark.session import get_spark

ROWS = 200_000
RANGES = {"a": (1_000, 3_000), "b": (10_000, 30_000)}


def main():
    ns = [int(a) for a in sys.argv[1:]] or [16, 64, 256]
    spark = get_spark(app_name="skipping_probe")
    df = (
        spark.range(ROWS)
        .select(
            F.col("id"),
            (F.col("id") % 100_000).alias("a"),
            (F.col("id") * 10 % 1_000_000).alias("b"),
        )
    )
    pred = (
        F.col("a").between(*RANGES["a"]) & F.col("b").between(*RANGES["b"])
    )
    expected = df.filter(pred).count()
    for n in ns:
        root = tempfile.mkdtemp(prefix=f"skip_probe_{n}_")
        path = os.path.join(root, "t")
        stats = write_zordered(df, path, ["a", "b"], n_files=n)
        t0 = time.monotonic()
        pruned = read_skipping(spark, path, {k: v for k, v in RANGES.items()})
        n_scan = len(pruned.inputFiles())
        got = pruned.count()
        t_pruned = time.monotonic() - t0
        t0 = time.monotonic()
        full = spark.read.parquet(path).filter(pred).count()
        t_full = time.monotonic() - t0
        assert got == full == expected, (got, full, expected)
        print(
            f"n_files={len(stats):4d} scanned={n_scan:4d} "
            f"({100 * n_scan / max(1, len(stats)):.0f}%) "
            f"pruned_scan={t_pruned:.2f}s full_scan={t_full:.2f}s "
            f"rows={got}"
        )


if __name__ == "__main__":
    main()
