"""Watermark bookkeeping (SURVEY §2 A10/B5/B6).

The reference keeps a per-(table, baseurl, path, synctype) high-water mark in
``sri2db_synctimes`` and advances it with clock-skew-compensated arithmetic
(``src/lib/client.js:1816-1843``). The mark is driver-side scalar state — tiny
— so the store is a single small parquet control table, rewritten atomically
per sync (exactly the reference's DELETE+INSERT upsert, client.js:714-751).
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.schema import SYNCTIMES_SCHEMA

# Cold-start watermark: 1900-01-01T00:00:00Z (client.js:1597)
COLD_START_MILLIS = -2208988800000

# Per-location process-level locks: Sri2DbMulti(concurrency>1) shares one
# synctimes location across endpoints; an unsynchronized read-modify-replace
# would lose whichever put raced. (Cross-process writers would need storage
# with an atomic commit protocol; the reference runs one process per target.)
_STORE_LOCKS: dict[str, threading.Lock] = {}
_STORE_LOCKS_GUARD = threading.Lock()


def _lock_for(location: str) -> threading.Lock:
    with _STORE_LOCKS_GUARD:
        return _STORE_LOCKS.setdefault(os.path.abspath(location), threading.Lock())

# Clock-skew compensation factors (client.js:1826-1834, README.md:248):
# assume client/server clocks drift <= 1%.
SAFETY_SLOW = 1.01
SAFETY_FAST = 0.99


def max_modified_millis(df: DataFrame, col: str = "modified") -> int | None:
    """B5 — running max(modified) over the synced batch, as epoch millis.

    The reference folds this record-at-a-time (client.js:1757-1760); here it
    is one map-side-combined aggregate.
    """
    row = df.agg(
        (F.unix_millis(F.max(F.col(col)))).alias("ms")
    ).first()
    return None if row is None else row["ms"]


def advance_watermark(
    last_modified_seen_ms: int | None,
    prev_watermark_ms: int | None,
    prev_syncstart_ms: int | None,
    syncstart_ms: int,
    syncend_ms: int,
) -> int | None:
    """B6 — conservative watermark advance, formula verbatim from
    client.js:1826-1839.

    new = max(lastModifiedSeen − 1.01·syncDuration,
              prevWatermark − 1.01·syncDuration + 0.99·(syncstart − prevSyncstart))
    and when the sync saw no records the old mark is kept unchanged
    (client.js:1836-1839). Pure driver-side arithmetic.
    """
    duration = syncend_ms - syncstart_ms
    candidates = []
    if last_modified_seen_ms is not None:
        candidates.append(int(last_modified_seen_ms - SAFETY_SLOW * duration))
    if prev_watermark_ms is not None and prev_syncstart_ms is not None:
        candidates.append(
            int(
                prev_watermark_ms
                - SAFETY_SLOW * duration
                + SAFETY_FAST * (syncstart_ms - prev_syncstart_ms)
            )
        )
    if last_modified_seen_ms is None:
        # no records seen: never advance past (or regress) the previous mark
        return prev_watermark_ms
    return max(candidates) if candidates else None


@dataclass
class WatermarkStore:
    """A10 — the ``sri2db_synctimes`` control table as a parquet dataset.

    Key = (tablename, baseurl, path, synctype); upsert = read → replace-key →
    commit through the pluggable committer (atomic rename swap locally,
    manifest-pointer publication on object stores). The table is
    O(#endpoints) rows, so a full rewrite per sync is the correct design at
    any scale.
    """

    spark: SparkSession
    location: str
    committer: object = None

    def __post_init__(self) -> None:
        if self.committer is None:
            from ..sinks.committer import RenameCommitter  # noqa: PLC0415

            self.committer = RenameCommitter()

    def _read(self) -> DataFrame:
        from ..sinks.committer import check_backend_layout  # noqa: PLC0415

        fs = self.committer.fs
        check_backend_layout(self.location, self.committer.versioned, fs=fs)
        physical = self.committer.resolve(self.location)
        if physical is not None and any(
            f.endswith(".parquet") for f in fs.listdir(physical)
        ):
            return self.spark.read.schema(SYNCTIMES_SCHEMA).parquet(
                fs.spark_path(physical)
            )
        from ..localframe import empty_df  # noqa: PLC0415

        return empty_df(self.spark, SYNCTIMES_SCHEMA)

    def get(
        self, tablename: str, baseurl: str | None, path: str | None, synctype: str
    ) -> tuple[int | None, int | None]:
        """Return (lastmodified_ms, syncstart_ms) or (None, None)."""
        with _lock_for(self.location):  # held through the action: the swap in
            # put momentarily renames the directory away
            row = self._read().filter(
                (F.col("tablename") == tablename)
                & F.col("baseurl").eqNullSafe(F.lit(baseurl))
                & F.col("path").eqNullSafe(F.lit(path))
                & (F.col("synctype") == synctype)
            ).first()
        if row is None:
            return None, None
        return row["lastmodified"], row["syncstart"]

    def put(
        self,
        tablename: str,
        baseurl: str | None,
        path: str | None,
        synctype: str,
        lastmodified_ms: int,
        syncstart_ms: int,
    ) -> None:
        """DELETE+INSERT upsert by the 4-column key (client.js:714-751),
        committed via atomic swap of the control-table directory. Serialized
        per location: concurrent endpoint syncs sharing one store must not
        lose each other's writes in the read-modify-replace."""
        with _lock_for(self.location):
            self._put_locked(
                tablename, baseurl, path, synctype, lastmodified_ms, syncstart_ms
            )

    def _put_locked(
        self,
        tablename: str,
        baseurl: str | None,
        path: str | None,
        synctype: str,
        lastmodified_ms: int,
        syncstart_ms: int,
    ) -> None:
        from ..sinks.committer import CommitConflict  # noqa: PLC0415

        # The in-process lock serializes upserts within THIS driver; on the
        # manifest backend the commit is additionally a compare-and-swap on
        # the version we read, so a concurrent writer in ANOTHER driver
        # (separate Spark apps sharing one control table) conflicts instead
        # of being silently overwritten — the upsert then re-reads and
        # re-applies, which converges because upserts by different keys
        # commute and same-key upserts are serialized by the sync engine.
        for attempt in range(5):
            basis = (
                self.committer.current_version(self.location)
                if self.committer.versioned
                else None
            )
            current = self._read()
            survivors = current.filter(
                ~(
                    (F.col("tablename") == tablename)
                    & F.col("baseurl").eqNullSafe(F.lit(baseurl))
                    & F.col("path").eqNullSafe(F.lit(path))
                    & (F.col("synctype") == synctype)
                )
            )
            # JVM LocalTableScan, not a pickled-row RDD: the upsert's tiny
            # coalesce(1) write otherwise drains 32 Python slices serially —
            # measured 5-7 s of the sync wall for a one-row control write
            # (see sri2db_spark.localframe)
            from ..localframe import local_df  # noqa: PLC0415

            new_row = local_df(
                self.spark,
                [(tablename, baseurl, path, synctype, lastmodified_ms, syncstart_ms)],
                SYNCTIMES_SCHEMA,
            )
            updated = survivors.unionByName(new_row)
            # stage() keeps the write on the store's own filesystem; on the
            # manifest backend it is the final version dir (pointer-only
            # commit)
            tmp = self.committer.stage(self.location)
            updated.coalesce(1).write.mode("overwrite").parquet(
                self.committer.fs.spark_path(tmp)
            )
            try:
                if self.committer.versioned:
                    self.committer.commit(
                        tmp, self.location, expected_basis=basis
                    )
                else:
                    self.committer.commit(tmp, self.location)
                return
            except CommitConflict:
                if attempt == 4:
                    raise
