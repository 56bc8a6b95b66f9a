"""Concurrent-writer soak over ONE Z-ordered table (r9 verdict item 5).

The CAS/commit layer is crash-tested pairwise elsewhere
(test_state_committer.py, test_fs_cas*.py); this module runs the real
interleaving: threads doing ``append_zordered`` (two writers),
``stream_zordered_ingest`` (a live Structured Streaming query),
``compact_zordered``, and ``rtbf_delete`` against the same table at the
same time, with one deterministically injected ``CommitConflict`` (a
competing commit landed between a writer's basis read and its pointer
write) on top of whatever natural races occur.

Pass criteria, per the verdict's wording:

* the final table equals the serial-execution reference (initial rows
  minus the retracted ids, plus every appended and streamed batch —
  the ops are set-commutative by construction: appended id ranges are
  disjoint and retractions only target initial ids);
* ``doctor --store / --rtbf-log / --index`` all exit 0 afterwards;
* every conflict surfaced loudly: raised to the caller and counted by
  the committer proxy — never swallowed (asserted >= 1, guaranteed by
  the injection), and every retried op eventually succeeded.
"""

from __future__ import annotations

import pytest

import json
import os
import shutil
import threading
import time

from pyspark.sql import functions as F, types as T

from sri2db_spark.cli import doctor_main
from sri2db_spark.functions.layout import (
    append_zordered,
    compact_zordered,
    read_skipping,
    write_zordered,
)
from sri2db_spark.functions.rtbf import rtbf_delete
from sri2db_spark.functions.similarity import build_ivf_index
from sri2db_spark.sinks.committer import (
    UNCONDITIONAL,
    CommitConflict,
    ManifestCommitter,
)
from sri2db_spark.streaming.zorder_ingest import stream_zordered_ingest

pytestmark = pytest.mark.full  # evidence lane: minutes-long seeded run


COLS = ["doc_id", "n"]


class _CountingCommitter:
    """ManifestCommitter proxy: counts commits and conflicts, and injects
    ONE deterministic conflict — before the first CAS commit on the soak
    table it republishes the current version (a byte-copy under a fresh
    version id), exactly the "another writer committed first" interleaving
    the CAS exists to catch; the caller's commit then must raise."""

    versioned = True

    def __init__(self, inner: ManifestCommitter, table: str) -> None:
        self._inner = inner
        self.fs = inner.fs
        self._table = table
        self._lock = threading.Lock()
        self._inject_pending = True
        self.injected = 0
        self.commits = 0
        self.conflicts: list[str] = []

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def commit(self, tmp_dir, dst_dir, expected_basis=UNCONDITIONAL):
        do_inject = False
        with self._lock:
            if (
                self._inject_pending
                and dst_dir == self._table
                and expected_basis is not UNCONDITIONAL
                # first publication has no committed version to republish
                # (write_zordered CAS-commits with expected_basis=None);
                # wait for a commit that builds on real state
                and expected_basis is not None
            ):
                self._inject_pending = False
                do_inject = True
        if do_inject:
            # the competing writer shares the caller's basis and must win
            # with a CAS of its own — an unconditional competing commit
            # could race a THIRD writer's real commit and erase it (the
            # first version of this harness did exactly that and
            # manufactured the lost update it was hunting)
            cur = self._inner.resolve(dst_dir, expected_basis)
            injected_ok = False
            if cur is not None:
                competing = self._inner.stage(dst_dir)
                shutil.copytree(cur, competing, dirs_exist_ok=True)
                try:
                    self._inner.commit(competing, dst_dir, expected_basis)
                    injected_ok = True
                except CommitConflict:
                    pass  # a real writer beat the injection to it
            with self._lock:
                if injected_ok:
                    self.injected += 1
                else:
                    self._inject_pending = True  # re-arm for the next commit
        try:
            self._inner.commit(tmp_dir, dst_dir, expected_basis)
            with self._lock:
                self.commits += 1
        except CommitConflict as e:
            with self._lock:
                self.conflicts.append(str(e))
            raise


def _retrying(fn, what: str, budget: int = 30):
    """The caller-side contract CommitConflict documents: re-read, re-run.
    The conflict is NOT swallowed here — the committer proxy already
    counted the raise; this is the retry loop a production scheduler runs."""
    for _ in range(budget):
        try:
            return fn()
        except CommitConflict:
            continue
    raise AssertionError(f"{what}: CommitConflict retry budget exhausted")


def _docs(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("n")
    )


def test_vanished_basis_surfaces_as_commit_conflict(spark, tmp_path):
    """A writer whose basis version dir was superseded AND collected by a
    concurrent rewrite's GC mid-staging must see CommitConflict (retry on
    the new basis), not a raw FileNotFoundError that kills retry loops —
    the exact interleaving the first soak run hit inside the stream's
    foreachBatch. A missing FILE_STATS under a STILL-CURRENT basis keeps
    raising ValueError (real corruption stays loud)."""
    import pytest

    table = str(tmp_path / "zt")
    mc = ManifestCommitter()
    write_zordered(_docs(spark, 0, 50), table, COLS, n_files=2, committer=mc)

    class _StaleResolver:
        versioned = True
        fs = mc.fs

        def __getattr__(self, name):
            return getattr(mc, name)

        def resolve(self, dst_dir, version=None):
            # the dir this writer read as its basis no longer exists
            return os.path.join(table, "v_collected_by_gc")

    with pytest.raises(CommitConflict) as ei:
        append_zordered(
            _docs(spark, 100, 120), table, COLS, n_files=2,
            committer=_StaleResolver(),
        )
    assert ei.value.expected == "v_collected_by_gc"

    # still-current basis, stats genuinely missing -> ValueError, not a
    # conflict (nothing to retry onto)
    cur = mc.resolve(table)
    os.remove(os.path.join(cur, "_FILE_STATS.json"))
    with pytest.raises(ValueError, match="no _FILE_STATS"):
        append_zordered(
            _docs(spark, 100, 120), table, COLS, n_files=2, committer=mc
        )


def test_soak_concurrent_writers_single_table(spark, tmp_path):
    table = str(tmp_path / "zt")
    log_dir = str(tmp_path / "rtbf_log")
    idx = str(tmp_path / "idx")
    cc = _CountingCommitter(ManifestCommitter(), table)

    write_zordered(_docs(spark, 0, 600), table, COLS, n_files=4, committer=cc)
    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (F.col("id") * 31 + i).cast("float") % 7,
        ).alias("embedding"),
    )
    build_ivf_index(emb, idx, nlist=4)

    errors: list[BaseException] = []

    def _guard(fn):
        def run():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 - surfaced via errors
                errors.append(e)

        return run

    def appender(base_id: int):
        def work():
            for b in range(3):
                lo = base_id + b * 1_000
                _retrying(
                    lambda lo=lo: append_zordered(
                        _docs(spark, lo, lo + 200), table, COLS,
                        n_files=2, committer=cc,
                    ),
                    f"append@{base_id}",
                )

        return work

    def compactor():
        for _ in range(3):
            time.sleep(0.4)
            _retrying(
                lambda: compact_zordered(spark, table, cc, min_depth=2),
                "compact",
            )

    def retractor():
        # only INITIAL ids are retracted and appended ranges never reuse
        # them, so the serial reference is interleaving-independent
        for ids in ([5, 6, 7, 8, 9], [300, 301, 302]):
            time.sleep(0.2)
            _retrying(
                lambda ids=ids: rtbf_delete(
                    spark, ids, log_dir,
                    zordered_path=table, index_path=idx,
                    vec_ids=ids, committer=cc,
                ),
                "rtbf",
            )

    feed = tmp_path / "feed"
    feed.mkdir()
    for b in range(2):
        rows = [
            {"doc_id": 50_000 + b * 1_000 + i, "n": (50_000 + b * 1_000 + i) % 97}
            for i in range(150)
        ]
        p = feed / f"b{b}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1_000 + b, 1_000 + b))

    def streamer():
        stream = (
            spark.readStream.schema(
                T.StructType(
                    [
                        T.StructField("doc_id", T.LongType()),
                        T.StructField("n", T.LongType()),
                    ]
                )
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        q = stream_zordered_ingest(
            stream, table, COLS, str(tmp_path / "ckpt"), cc,
            n_files=2, max_commit_retries=30,
        )
        assert q.awaitTermination(180), "stream did not finish"

    threads = [
        threading.Thread(target=_guard(fn), daemon=True)
        for fn in (
            appender(10_000),
            appender(20_000),
            compactor,
            retractor,
            streamer,
        )
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
        assert not t.is_alive(), "soak thread stalled"
    assert not errors, errors

    # -- serial-execution reference ---------------------------------------
    expected = set(range(0, 600)) - {5, 6, 7, 8, 9, 300, 301, 302}
    for base in (10_000, 20_000):
        for b in range(3):
            expected |= set(range(base + b * 1_000, base + b * 1_000 + 200))
    expected |= set(range(50_000, 50_150)) | set(range(51_000, 51_150))
    got = [
        r["doc_id"]
        for r in read_skipping(spark, table, {}, committer=cc).collect()
    ]
    assert len(got) == len(set(got)), "duplicate rows after soak"
    assert set(got) == expected

    # -- conflicts were surfaced, not swallowed ----------------------------
    assert cc.injected == 1
    assert len(cc.conflicts) >= 1, "the injected conflict never raised"
    assert cc.commits >= 10  # every writer eventually succeeded

    # -- post-soak health: doctor exits 0 on all three artifacts -----------
    assert doctor_main(["doctor", "--store", table]) == 0
    assert doctor_main(["doctor", "--rtbf-log", log_dir]) == 0
    assert doctor_main(["doctor", "--index", idx, "--committer", "rename"]) == 0
