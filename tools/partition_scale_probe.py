"""Probe: LakeTable.read() planning/exec cost vs partition count on the
manifest backend (union-of-resolved-scans design), and a candidate
single-multi-path-scan alternative. Builds N committed partitions cheaply
by copytree-ing one real committed partition.

Usage: python tools/partition_scale_probe.py [N ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sri2db_spark.model.schema import LAYOUT_LARGE, resource_row_schema
from sri2db_spark.session import get_spark
from sri2db_spark.sinks.committer import ManifestCommitter
from sri2db_spark.sinks.lake import LakeTable

BASEURL = "https://api.example.org"


def build(spark, root: str, n: int) -> LakeTable:
    table = LakeTable(spark, root, LAYOUT_LARGE, committer=ManifestCommitter())
    rows = spark.createDataFrame(
        [(f"/p0/{i}", str(i), None, "{}", "T") for i in range(5)],
        "href string, key string, modified timestamp, jsondata string, resourcetype string",
    )
    table.replace_partition(rows, BASEURL, "/p0")
    proto = table._partition_dir(BASEURL, "/p0")
    parent = os.path.dirname(proto)
    for i in range(1, n):
        shutil.copytree(proto, os.path.join(parent, f"path=%2Fp{i}"))
    return table

def main():
    ns = [int(a) for a in sys.argv[1:]] or [100, 300, 1000]
    spark = get_spark(master="local[8]")
    for n in ns:
        root = tempfile.mkdtemp(prefix=f"lakeparts{n}_")
        try:
            t0 = time.time()
            table = build(spark, root, n)
            t_build = time.time() - t0
            t0 = time.time()
            df = table.read()
            t_plan = time.time() - t0
            t0 = time.time()
            cnt = df.count()
            t_count = time.time() - t0
            t0 = time.time()
            one = table.read_partition(BASEURL, f"/p{n // 2}").count()
            t_one = time.time() - t0
            print(
                f"n={n} build={t_build:.1f}s plan={t_plan:.1f}s "
                f"count={cnt} in {t_count:.1f}s one-partition={one} in {t_one:.1f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
