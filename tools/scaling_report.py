#!/usr/bin/env python
"""Per-entry scaling exponents from bench captures at multiple scale factors.

Usage:
    python tools/scaling_report.py sf0.1=<bench.json|bench_stdout.txt> \
        sf1=<...> [sf10=<...>]

Each input is either a driver BENCH_r{N}.json (the ``parsed`` headline is
used) or raw ``bench.py`` stdout (the last headline line is used). For
every entry present in >= 2 captures the report prints the fitted log-log
slope alpha where ``time ~ sf^alpha``:

* alpha ~ 0   fixed-size work (O(batch)/O(touched) maintenance entries)
* alpha ~ 1   linear in data — the target for scans/aggs/dedup at scale
* alpha >> 1  superlinear — either the entry's WORK grows superlinearly by
  construction (the bulk-ANN entries: queries x corpus both scale) or a
  plan that will not survive 100x; tell them apart with .explain before
  concluding.

Slopes from 2 points are a ratio, from 3+ a least-squares fit. Entries at
sub-second absolute times carry large relative noise — read alpha together
with the absolute seconds, not alone.
"""

from __future__ import annotations

import json
import math
import sys


def _headline(path: str) -> dict:
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "parsed" in doc and doc["parsed"]:
            doc = doc["parsed"]
        if isinstance(doc, dict) and "queries" in doc:
            return doc["queries"]
    except json.JSONDecodeError:
        pass
    heads = []
    for line in text.splitlines():
        if not line.strip().startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue  # driver tail-captures can truncate a line mid-object
        # headline lines carry "metric"+"queries"; the diagnostics line
        # only mentions "metric" inside spread_gate — check parsed keys
        if isinstance(obj, dict) and "metric" in obj and "queries" in obj:
            heads.append(obj)
    if not heads:
        raise SystemExit(f"{path}: no bench headline found")
    return heads[-1]["queries"]


def main(argv: list[str]) -> None:
    if len(argv) < 2:
        raise SystemExit(__doc__)
    points: list[tuple[float, dict]] = []
    for arg in argv:
        sf_s, _, path = arg.partition("=")
        if not path:
            raise SystemExit(f"expected sf=<path>, got {arg!r}")
        points.append((float(sf_s.lstrip("sf")), _headline(path)))
    points.sort()
    names = sorted(set.intersection(*[set(q) for _, q in points]))
    if not names:
        raise SystemExit("no common entries across captures")
    sfs = [sf for sf, _ in points]
    print(
        f"{'entry':34s} "
        + " ".join(f"sf{sf:g}".rjust(9) for sf in sfs)
        + "  alpha"
    )
    for n in names:
        xs = [math.log(sf) for sf, _ in points]
        ys = [math.log(q[n]) for _, q in points]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs)
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        print(
            f"{n:34s} "
            + " ".join(f"{q[n]:9.3f}" for _, q in points)
            + f"  {alpha:5.2f}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
