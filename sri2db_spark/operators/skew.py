"""Skew-mitigation operators: salting for heavy-hitter keys.

AQE's skew-join handling rebalances oversized *partitions* of sort-merge
joins at runtime, but two skew shapes still serialize on one task:

- an equi-join whose hot key exceeds a single task even after AQE splits
  (AQE cannot split the *build* side of a broadcast, nor help a
  shuffled-hash build), and
- a per-group window/top-k where one group's partition is sorted by a
  single reducer.

Both have the classic salting fix, expressed here as reusable DataFrame
transforms with exact, deterministic semantics (results are identical to
the unsalted operator — only the physical distribution changes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted into ``salt``
    sub-keys and the right side replicated once per salt value.

    A hot key's rows land on ``salt`` different reducers instead of one;
    the right side grows ``salt``× (use for moderate right sides — for
    tiny ones just broadcast). The per-row salt is a deterministic hash of
    the whole left row, so repeated runs produce identical physical
    assignments. Results equal ``left.join(right, keys, how)`` exactly for
    ``inner`` and ``left`` joins: each left row matches the single replica
    of its key carrying its own salt.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    lcols = [F.col(c) for c in left.columns]
    salted_l = left.withColumn("__salt", F.pmod(F.hash(*lcols), F.lit(salt)))
    salted_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_l.join(salted_r, [*keys, "__salt"], how).drop("__salt")


def salted_top_k(
    df: DataFrame,
    part_keys: list[str],
    order_exprs: list,
    k: int,
    salt: int = 16,
) -> DataFrame:
    """Per-group top-k that survives a single giant group: local top-k
    within (group, salt) — ``salt`` parallel partial sorts — then a final
    top-k over the ≤ ``salt·k`` survivors per group.

    ``order_exprs`` must define a TOTAL order (include a tiebreak) so the
    result is deterministic and equal to the single-window formulation.
    Emits the input columns plus ``rank``.
    """
    cols = [F.col(c) for c in df.columns]
    salted = df.withColumn("__salt", F.pmod(F.hash(*cols), F.lit(salt)))
    w1 = Window.partitionBy(*part_keys, "__salt").orderBy(*order_exprs)
    local = (
        salted.withColumn("__r", F.row_number().over(w1))
        .filter(F.col("__r") <= k)
        .drop("__r", "__salt")
    )
    w2 = Window.partitionBy(*part_keys).orderBy(*order_exprs)
    return local.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )
