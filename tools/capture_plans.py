#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [name ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
"before"). Explain only — no execution, so it is cheap and data-independent.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sri2db_spark.plans.analytics import QUERIES  # noqa: E402
from sri2db_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    if not names:
        names = list(QUERIES)
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"SKIP unknown {name}")
            continue
        buf = io.StringIO()
        try:
            df = fn(spark, sf_dir)
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as e:  # capture the failure instead of dying
            buf.write(f"EXPLAIN FAILED: {e}\n")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
