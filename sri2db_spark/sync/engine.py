"""Sync lifecycle (SURVEY §3): fullSync / deltaSync / safeDeltaSync.

All three flavors funnel into one generic ``_sync`` exactly like the
reference's ``sync(modifiedSince, safeDeltaSync)`` (``src/lib/client.js:1649``,
entry points :1923-1941):

  fullSync       = _sync(full=True)        scan all → replace partition
  deltaSync      = _sync(since=watermark)  tombstones + changed rows → merge
  safeDeltaSync  = deltaSync + set-membership reconciliation (client.js:1776-1805)

plus the reference's operational semantics: single-flight mutex
(client.js:1897-1915), dry-run (client.js:1808-1813), conservative watermark
advance (client.js:1816-1843; skipped when the caller passed an explicit
modifiedSince — README.md:174).
"""

from __future__ import annotations

import datetime as dt
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import Observation
from pyspark.sql import functions as F

from ..model.schema import LAYOUT_LARGE, TableLayout
from ..operators.merge import (
    anti_join_missing,
    dedup_latest,
    insert_if_absent,
    merge_full,
    merge_incremental,
    set_difference_delete,
)
from ..operators.normalize import project_to_row, repair_resources
from ..operators.watermark import (
    COLD_START_MILLIS,
    WatermarkStore,
    advance_watermark,
    max_modified_millis,
)
from ..sinks.lake import LakeTable
from ..sources.sri_api import SriApiReader


def _now_ms() -> int:
    return int(time.time() * 1000)


def _ms_to_iso(ms: int) -> str:
    return (
        dt.datetime.fromtimestamp(ms / 1000.0, tz=dt.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]
        + "Z"
    )


@dataclass
class SyncResult:
    """Mirrors the reference's sync result object (client.js:1845-1848)."""

    synctype: str
    resources_synced: int
    deletes_synced: int
    rows_after: int
    elapsed_ms: int
    dry_run: bool
    watermark_ms: int | None = None

    @property
    def records_per_s(self) -> float:
        return self.resources_synced / max(self.elapsed_ms / 1000.0, 1e-9)


@dataclass
class Sri2DbSync:
    """One API endpoint → one lake-table partition, incrementally."""

    reader: SriApiReader
    table: LakeTable
    path: str
    baseurl: str | None = None
    layout: TableLayout = LAYOUT_LARGE
    watermarks: WatermarkStore | None = None
    tablename: str = "resources"
    prefer_updates_over_inserts: bool = False  # pg default, client.js:113
    deleted_not_implemented: bool = False  # README.md:78
    dry_run: bool = False
    explain: bool = False  # print the merge's physical plan (client.js:168-179)
    # Scale path for full syncs: when set, probe $$meta.count and read the
    # collection as disjoint executor-owned offset shards of this many rows
    # (A2 offset addressing, client.js:1498-1501) instead of sequential
    # next-link paging. Requires an offset-addressable server; falls back to
    # sequential when the count probe returns nothing.
    full_sync_shard_size: int | None = None
    # Same A2 offset sharding for the DELTA feed (r12 verdict item 4): a
    # 100 TB deployment's modifiedSince feed can be millions of rows, and
    # the driver-sequential next-link scan (the A4 reference-fidelity path,
    # which stays the default) serializes it. The probe carries the same
    # modifiedSince predicate, so the sharded read pages exactly the rows
    # the sequential scan would; watermark stats and the merge operator are
    # untouched. Falls back to sequential when the count probe returns
    # nothing. The tombstone feed stays sequential — it is expand=NONE and
    # orders of magnitude smaller than the update feed.
    delta_sync_shard_size: int | None = None
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    # -- public entry points (client.js:1923-1941) ---------------------------

    def full_sync(self) -> SyncResult:
        return self._sync(None, full=True)

    def delta_sync(self, modified_since: str | None = None) -> SyncResult:
        return self._sync(modified_since, full=False)

    def safe_delta_sync(self, modified_since: str | None = None) -> SyncResult:
        return self._sync(modified_since, full=False, safe=True)

    def configured_sync(self, synctype: str = "deltaSync") -> SyncResult:
        return {
            "fullSync": self.full_sync,
            "deltaSync": self.delta_sync,
            "safeDeltaSync": self.safe_delta_sync,
        }[synctype]()

    # -- lifecycle ------------------------------------------------------------

    def _keys(self) -> tuple[str, ...]:
        return self.layout.key_columns

    def _stage(self, pages_df, ingest_ts=None):
        """repair (B2) + project (B3) a raw (href, resource) scan to row shape.

        ``ingest_ts`` is the sync's fixed driver-side ingest timestamp: the
        default-``modified`` repair must not re-evaluate ``current_timestamp()``
        per job, or the watermark-stats job and the final write would see
        different values for the same repaired row.
        """
        return project_to_row(
            repair_resources(pages_df, ingest_ts),
            self.layout,
            self.baseurl,
            self.path.split("?")[0],
        )

    def _sync(self, modified_since: str | None, full: bool, safe: bool = False) -> SyncResult:
        # D4 single-flight: a sync started while one runs is rejected with 0
        # (client.js:1897-1899, README.md:176).
        if not self._lock.acquire(blocking=False):
            return SyncResult("REJECTED", 0, 0, -1, 0, self.dry_run)
        try:
            return self._inner_sync(modified_since, full, safe)
        finally:
            self._lock.release()

    def _inner_sync(self, modified_since: str | None, full: bool, safe: bool) -> SyncResult:
        syncstart = _now_ms()
        synctype = "FULL" if full else ("SAFEDELTA" if safe else "DELTA")
        explicit_since = modified_since is not None
        # one fixed ingest timestamp for every staging step of this sync
        ingest = F.lit(
            dt.datetime.fromtimestamp(syncstart / 1000.0, tz=dt.timezone.utc)
        )

        prev_wm_ms = prev_start_ms = None
        if not full and self.watermarks is not None:
            prev_wm_ms, prev_start_ms = self.watermarks.get(
                self.tablename, self.baseurl, self.path.split("?")[0], synctype
            )
        if not full and modified_since is None:
            # cold-start watermark 1900-01-01 (client.js:1590-1598)
            modified_since = _ms_to_iso(prev_wm_ms if prev_wm_ms is not None else COLD_START_MILLIS)

        keys = self._keys()
        target = self.table.read_partition(self.baseurl, self.path.split("?")[0])

        # Phase 0 (delta only): tombstone scan (A5, client.js:1726-1741).
        # Deliberately skipped on safeDeltaSync, exactly like the reference
        # (client.js:1726: !isFullSync && !isSafeDeltaSync) — membership
        # reconciliation already covers deletions there; the extra scan would
        # be a full wasted API pass per safe sync.
        deletes_df = None
        obs_deletes = None
        n_deletes = 0
        if not full and not safe and not self.deleted_not_implemented:
            raw_deletes = self.reader.read_collection(
                self.path, modified_since=modified_since, expand="NONE", deleted=True
            )
            deletes_pre = self._stage(raw_deletes, ingest).select(*keys)
            # the tombstone count rides the merge job (observe) instead of
            # an eager count() that would evaluate the staging chain twice
            obs_deletes = Observation()
            deletes_df = deletes_pre.observe(
                obs_deletes, F.count(F.lit(1)).alias("n")
            )

        # Scan + stage (A1/A4/A6 → B1/B2/B3); full syncs optionally use the
        # distributed offset-sharded scan (A2) — executor-side paging over
        # disjoint ranges — instead of driver-sequential next links.
        raw = None
        if full and self.full_sync_shard_size:
            total = self.reader.probe_count(self.path)
            if total is not None and total > 0:
                raw = self.reader.read_offset_sharded(
                    self.path, total_count=total, shard_size=self.full_sync_shard_size
                )
        elif not full and self.delta_sync_shard_size and modified_since:
            # A2 offset sharding over the modifiedSince-filtered feed: the
            # predicate lives in the path, so probe and shards page the
            # identical filtered collection the sequential scan would.
            import urllib.parse  # noqa: PLC0415

            sep = "&" if "?" in self.path else "?"
            dpath = (
                f"{self.path}{sep}modifiedSince="
                f"{urllib.parse.quote(modified_since)}"
            )
            total = self.reader.probe_count(dpath)
            if total is not None and total > 0:
                raw = self.reader.read_offset_sharded(
                    dpath, total_count=total, shard_size=self.delta_sync_shard_size
                )
        if raw is None:
            raw = self.reader.read_collection(
                self.path, modified_since=None if full else modified_since, expand="FULL"
            )
        staged = self._stage(raw, ingest)
        # Batch size + watermark max (B5) ride the merge/write job via
        # observe(): the staged scan — at scale a full distributed API read
        # (read_offset_sharded pages inside executor Python workers) — is
        # computed ONCE instead of once for the stats and again for the
        # merge. Exception: merge-mode full sync consumes the staged frame
        # twice inside ONE plan (semi-join + upsert), where a duplicated
        # CollectMetrics node would double-count — that path keeps the
        # eager aggregate (its staged side is also the one the C3
        # delete-all default avoids entirely).
        obs_staged = None
        n_staged = last_seen_ms = None
        staged_pre = staged
        if full and self.prefer_updates_over_inserts:
            stats = staged.agg(
                F.count(F.lit(1)).alias("n"),
                F.unix_millis(F.max("modified")).alias("mx"),
            ).first()
            n_staged, last_seen_ms = stats["n"], stats["mx"]
        else:
            obs_staged = Observation()
            staged = staged.observe(
                obs_staged,
                F.count(F.lit(1)).alias("n"),
                F.unix_millis(F.max("modified")).alias("mx"),
            )

        # Merge (C1-C6)
        if full:
            merged = merge_full(
                target, staged, keys, self.prefer_updates_over_inserts
            )
        else:
            merged = merge_incremental(target, staged, deletes_df, keys)

        def _resolve_staged_stats() -> None:
            # pull the observed batch stats once the first action on the
            # merged plan has run (observe fills on that job). When the
            # optimizer proved the staged input EMPTY and eliminated the
            # observed subtree (PropagateEmptyRelation — e.g. a delta with
            # no changes), the observation never fills and .get raises;
            # fall back to the direct aggregate, which is trivial exactly
            # in that case.
            nonlocal n_staged, last_seen_ms
            if obs_staged is not None and n_staged is None:
                try:
                    row = obs_staged.get
                    n_staged, last_seen_ms = row["n"], row["mx"]
                except Exception:
                    stats = staged_pre.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.unix_millis(F.max("modified")).alias("mx"),
                    ).first()
                    n_staged, last_seen_ms = stats["n"], stats["mx"]

        # Safe-delta membership reconciliation (A7/C7/C8/C9/A3,
        # client.js:1776-1805) against the post-merge contents.
        gap_rows = None
        if safe:
            membership_raw = self.reader.read_collection(self.path, expand="NONE")
            membership = self._stage(membership_raw, ingest).select(*keys)
            missing = anti_join_missing(membership, merged, keys)  # C8
            # The gap list is unbounded after an outage, so it never
            # materializes on the driver: executor-side keyIn fetch (A3)
            # over the missing hrefs, persisted because both the watermark
            # stats and the merge consume it.
            n_missing = missing.count()
            _resolve_staged_stats()  # filled by the count above
            if n_missing:
                fetched = self.reader.get_hrefs_distributed(
                    self.path, missing.select("href")
                )  # A3
                gap_rows = self._stage(fetched, ingest).persist()
                merged = insert_if_absent(merged, gap_rows, keys)  # C9
                n_staged += n_missing
                gap_max = max_modified_millis(gap_rows)
                if gap_max is not None:
                    last_seen_ms = max(last_seen_ms or gap_max, gap_max)
            merged = set_difference_delete(merged, membership, keys)  # C7

        # EXPLAIN instrumentation hook (client.js:168-179)
        if self.explain:
            merged.explain("formatted")

        # Commit or dry-run rollback (D6, client.js:1808-1813)
        if self.dry_run:
            rows_after = merged.count()
        else:
            rows_after = self.table.replace_partition(
                merged, self.baseurl, self.path.split("?")[0]
            )
        if gap_rows is not None:
            gap_rows.unpersist()
        _resolve_staged_stats()  # filled by the write / dry-run count
        if obs_deletes is not None:
            try:
                n_deletes = obs_deletes.get["n"]
            except Exception:  # observed subtree optimized away (empty feed)
                n_deletes = deletes_pre.count()

        # Watermark advance (B6) — skipped on explicit modifiedSince
        # (client.js:1816, README.md:174) and on dry runs.
        syncend = _now_ms()
        new_wm = None
        if not explicit_since and self.watermarks is not None and not self.dry_run:
            new_wm = advance_watermark(
                last_seen_ms, prev_wm_ms, prev_start_ms, syncstart, syncend
            )
            if new_wm is not None:
                self.watermarks.put(
                    self.tablename,
                    self.baseurl,
                    self.path.split("?")[0],
                    synctype,
                    new_wm,
                    syncstart,
                )

        return SyncResult(
            synctype=synctype,
            resources_synced=n_staged,
            deletes_synced=n_deletes,
            rows_after=rows_after,
            elapsed_ms=syncend - syncstart,
            dry_run=self.dry_run,
            watermark_ms=new_wm,
        )
