"""Set-oriented merge operators (SURVEY §2.C) as pure DataFrame transforms.

The reference executes these as generated SQL inside the target database
(reference ``src/lib/client.js:871-1239``). Here they are declarative
DataFrame operations so Catalyst picks the physical strategy: the staged
batch of one sync is small relative to a 100 TB target table, so every join
below puts the *staged* side second and lets AQE/broadcast handle it; the
target side is only ever touched through partition-pruned scans (the caller
pre-filters the target to the sync's (baseurl, path) partition).

Naming convention: ``target`` = current table contents (already scoped to the
sync's partition), ``staged`` = this sync's batch (the reference's temp
tables, SURVEY §1.3).

All operators are join-key-generic: ``keys`` is the logical uniqueness key
(baseurl?, path?, href) from ``TableLayout.key_columns``, but nothing here is
SRI-specific — they are reusable upsert/CDC primitives.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str = "modified",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """C1 — keep only the newest row per key.

    Reference: ROW_NUMBER() OVER (PARTITION BY [baseurl,][path,]href ORDER BY
    modified DESC) = 1 (client.js:1084-1091). Pages of a shifting result set
    can return the same href twice; the merge must be idempotent on the newest
    version.

    Scale note: this is a single hash-partition shuffle on the key; the later
    joins in the same merge reuse that partitioning (Catalyst sees the
    compatible distribution and avoids re-shuffling).
    """
    order = [F.col(order_col).desc_nulls_last()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _nullsafe_key_join(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str
) -> DataFrame:
    """Anti/semi join on scoping keys with null-safe equality.

    The reference's merge SQL compares key columns with ``IS NOT DISTINCT
    FROM`` (mirrored in sinks/jdbc.py), because nullable scoping columns —
    baseurl is NULL whenever the endpoint has no baseUrl configured, the
    engine's default — must still match. Plain ``on=keys`` equality silently
    drops every NULL-keyed row from the join. EqualNullSafe is still an
    equi-join key for Catalyst, so this stays hash-joinable/broadcastable.
    """
    r = right.select(*[F.col(k).alias(f"__k_{k}") for k in keys]).distinct()
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
        cond = c if cond is None else cond & c
    return left.join(r, cond, how)


def anti_join_missing(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """C2/C8 — rows of ``left`` whose key is absent from ``right``.

    Reference shapes: full-sync stale-row delete (NOT EXISTS,
    client.js:1006-1015) and missing-member detection (LEFT JOIN … IS NULL,
    client.js:1266-1280). Both are the one canonical left-anti join.
    """
    return _nullsafe_key_join(left, right, keys, "left_anti")


def semi_join_delete(
    target: DataFrame, tombstones: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """C4 — drop target rows matching staged tombstones; returns survivors.

    Reference: DELETE … USING deletes t WHERE w.href = t.href
    (client.js:1033-1038). In DataFrame terms survivors = left_anti against
    the tombstone keys.
    """
    return _nullsafe_key_join(target, tombstones, keys, "left_anti")


def change_detecting_upsert(
    target: DataFrame,
    staged: DataFrame,
    keys: Sequence[str],
    payload_col: str = "jsondata",
) -> DataFrame:
    """C5+C6 — full upsert with null-safe change detection; returns new table.

    Semantics (client.js:1057-1111):
      - key in both, payload null-safe-equal     → keep target row (skip
        the dead write; reference predicate ``jsondata <> t.jsondata OR
        exactly-one-NULL`` at client.js:1064 — i.e. NOT(a <=> b))
      - key in both, payload differs             → take staged row
      - key only in staged                        → insert staged row
      - key only in target                        → keep target row

    ``staged`` must already be C1-deduped. One shuffle on the key for the
    outer join; AQE broadcast-joins when staged is small.
    """
    t_cols = target.columns
    # Explicit presence markers: key columns cannot serve as the "row exists
    # on this side" sentinel because scoping keys are legitimately NULL
    # (baseurl=None is the engine default) — a NULL key is a value, not
    # absence. The reference compares keys with IS NOT DISTINCT FROM
    # (client.js:1057-1111 via the null-safe WHERE at :1064).
    t = target.withColumn("__t_present", F.lit(1))
    staged_r = staged.withColumn("__present", F.lit(1)).select(
        *[F.col(c).alias(f"__s_{c}") for c in [*staged.columns, "__present"]]
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__s_{k}"))
        cond = c if cond is None else cond & c
    joined = t.join(staged_r, on=cond, how="full_outer")

    take_staged = F.col("__s___present").isNotNull() & (
        F.col("__t_present").isNull()  # insert: key only in staged
        | ~(F.col(payload_col).eqNullSafe(F.col(f"__s_{payload_col}")))
    )
    out = joined.select(
        *[
            F.when(take_staged, F.col(f"__s_{c}")).otherwise(F.col(c)).alias(c)
            for c in t_cols
        ]
    )
    return out


def insert_if_absent(
    target: DataFrame,
    staged: DataFrame,
    keys: Sequence[str],
    order_col: str = "modified",
) -> DataFrame:
    """C6/C9 — append staged rows whose key is not in target; returns new table.

    Reference: dedup subquery + NOT EXISTS insert (client.js:1069-1111,
    1201-1232). Used standalone by the safe-delta gap insert.
    """
    fresh = _nullsafe_key_join(
        dedup_latest(staged, keys, order_col), target, keys, "left_anti"
    )
    return target.unionByName(fresh.select(*target.columns))


def set_difference_delete(
    target: DataFrame, membership: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """C7 — keep only target rows still members of the (filtered) collection.

    Reference: safe-delta reconciliation, ``(cols) NOT IN (SELECT … FROM
    membership)`` (client.js:1184-1199). Survivors = left_semi against the
    membership key set. The caller scopes ``target`` to the sync's
    baseurl/path partition first — the reference comment at client.js:1138
    warns exactly about forgetting that scoping.
    """
    return _nullsafe_key_join(target, membership, keys, "left_semi")


def merge_full(
    target: DataFrame,
    staged: DataFrame,
    keys: Sequence[str],
    prefer_updates_over_inserts: bool = False,
    order_col: str = "modified",
) -> DataFrame:
    """Full-sync merge (reference copyTempTablesDataToWriteTable with
    fullSync=true, client.js:871-1118); returns the new table contents for
    the sync's partition.

    Two modes, as in the reference (config ``preferUpdatesOverInserts``,
    client.js:113):
      - delete-all (pg default): partition contents are replaced by the
        deduped staged batch (C3 + blind C6). In lake terms this is a dynamic
        partition overwrite — the cheapest possible full sync.
      - merge mode (mssql default): C2 anti-join delete of stale rows +
        C5 change-detecting update + C6 insert.
    """
    staged_d = dedup_latest(staged, keys, order_col)
    if not prefer_updates_over_inserts:
        return staged_d.select(*target.columns)  # C3: partition replace
    survivors = _nullsafe_key_join(target, staged_d, keys, "left_semi")
    return change_detecting_upsert(survivors, staged_d, keys)


def versioned_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """SCD2-style version history: each row gains ``valid_from`` (its own
    timestamp), ``valid_to`` (the next version's timestamp, NULL while
    current) and ``is_current``.

    The lakehouse companion to :func:`change_detecting_upsert` — where the
    merge keeps only the latest state (the reference's target-table
    semantics), this derives the full validity timeline from the same
    ordered versions: one window over the key partitioning, no joins.
    ``tiebreak`` columns make the order total when timestamps can tie.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def merge_incremental(
    target: DataFrame,
    staged_updates: DataFrame,
    staged_deletes: DataFrame | None,
    keys: Sequence[str],
    order_col: str = "modified",
) -> DataFrame:
    """Delta-sync merge (client.js:871-1118 with fullSync=false): C4 tombstone
    delete, then C1-deduped C5+C6 upsert. Returns new partition contents."""
    t = target
    if staged_deletes is not None:
        t = semi_join_delete(t, staged_deletes, keys)
    staged_d = dedup_latest(staged_updates, keys, order_col)
    return change_detecting_upsert(t, staged_d, keys)
