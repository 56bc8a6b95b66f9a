"""Pluggable directory-commit protocols for the lake sink and control tables.

The reference commits every merge inside one DB transaction
(`/root/reference/src/lib/client.js:869-1040`); the parquet lake needs an
equivalent "readers see the old state or the new state, never in between"
protocol for replacing a partition directory. Two implementations:

- :class:`RenameCommitter` — write-new + two POSIX directory renames
  (dst → old, tmp → dst). Correct and cheap on a local/HDFS-like
  filesystem where directory rename is atomic. NOT safe on S3/GCS-style
  object stores (no atomic directory rename; between the two renames the
  destination does not exist), and a crash between the renames leaves the
  destination missing until repair.

- :class:`ManifestCommitter` — versioned directories + a manifest pointer.
  Writers :meth:`stage` the next version directory ``<dst>/v_<uuid>/`` and
  produce data DIRECTLY at its final path (an uncommitted version is
  invisible — readers only follow the pointer); the commit is ONE atomic
  publication: writing the tiny ``_MANIFEST`` file that names the current
  version. (A tmp dir staged elsewhere is also accepted and moved in.) Readers resolve through the manifest, so they
  always see a complete version — a crash before the manifest write
  leaves the previous version live; a crash after it leaves the new one
  live; there is no in-between. On an object store the manifest write is
  a single-key PUT (atomic); on a local filesystem it is
  ``os.replace`` (atomic file rename). Old versions are garbage-collected
  AFTER publication, and collection failures are harmless (orphan
  directories, never dangling pointers).

Both satisfy the same two-method protocol, so the lake sink, the watermark
store, and the curation-state layer (``functions.statestore`` reads,
``functions.pipeline`` compaction/retraction) take a ``committer`` and stay
backend-agnostic. Every filesystem touch goes through the minimal
interface in :mod:`.fs` — ``LocalFS`` (os/shutil) by default; the
rename-free ``ObjectStoreFS`` runs the same test suite, and an S3/GCS
binding is a drop-in. The operator layer maps unchanged onto Delta/Iceberg
(whose transaction logs are exactly the manifest idea, generalized).
"""

from __future__ import annotations

import os
import shutil
import uuid

from .fs import LocalFS

MANIFEST = "_MANIFEST"

#: default ``expected_basis``: publish unconditionally (last writer wins) —
#: the single-flight sync engine's contract (SURVEY D4), where at most one
#: writer per directory exists by construction
UNCONDITIONAL = object()


class CommitConflict(RuntimeError):
    """A compare-and-swap commit lost the race: the manifest pointer moved
    past the writer's ``expected_basis`` between its read and its commit.
    The staged data was discarded; re-read the store and re-run the op
    (every maintenance op that uses CAS is idempotent)."""

    def __init__(self, dst_dir: str, expected, actual) -> None:
        self.dst_dir = dst_dir
        self.expected = expected
        self.actual = actual
        super().__init__(
            f"commit conflict at {dst_dir}: expected basis "
            f"{expected!r}, found {actual!r} — another writer committed "
            "first; re-read and re-run"
        )


def check_backend_layout(dst_dir: str, versioned: bool, fs=None) -> None:
    """Raise when a directory's on-disk layout belongs to the OTHER commit
    protocol. Flipping ``committer`` on an existing store must fail loudly:
    a manifest reader over a flat rename-backend directory would resolve
    every partition to None and read the table as EMPTY (the next sync then
    publishes only its delta — silent data loss in the published view), and
    a rename-backend reader over a manifest directory would Hive-discover
    the ``v_*`` version dirs and return duplicated/garbled rows.

    Enforced on READS (LakeTable.read, WatermarkStore._read, state-store
    resolution) and on WRITES (replace_partition / compact_partition): a
    write-side flip is the more destructive one — a RenameCommitter commit
    over a manifest-versioned directory would rename the whole versioned
    tree (manifest, history, every pinned snapshot) aside and delete it."""
    fs = fs or LocalFS()
    if not fs.isdir(dst_dir):
        return
    has_manifest = fs.exists(os.path.join(dst_dir, MANIFEST))
    has_flat = any(n.endswith(".parquet") for n in fs.listdir(dst_dir))
    if versioned and has_flat and not has_manifest:
        raise ValueError(
            f"{dst_dir} holds flat parquet (rename-backend layout) but is "
            "being read through the ManifestCommitter — migrate the data "
            "(write it through a manifest commit) or configure the rename "
            "committer for this store"
        )
    if not versioned and has_manifest:
        raise ValueError(
            f"{dst_dir} is manifest-committed but is being read through "
            "the rename backend — configure committer='manifest' for this "
            "store"
        )


class RenameCommitter:
    """POSIX rename swap — the local-filesystem default."""

    #: readers can point Spark straight at the logical directory
    versioned = False

    def __init__(self, fs=None):
        # uniform interface with ManifestCommitter so callers can route
        # auxiliary listing through `committer.fs`; the swap itself stays
        # os.rename — this protocol is only valid where that is atomic,
        # so a non-local fs binding is rejected loudly instead of letting
        # the first commit fail halfway through its rename pair
        from .fs import FsspecFS  # noqa: PLC0415

        if isinstance(fs, FsspecFS):
            raise ValueError(
                "the rename protocol needs an atomic directory rename, "
                "which object-store/fsspec backends do not have — use "
                "ManifestCommitter for this filesystem"
            )
        self.fs = fs or LocalFS()

    def stage(self, dst_dir: str) -> str:
        """A fresh directory for the writer to produce the new state into;
        pass it to :meth:`commit` when the write succeeds. Here: a sibling
        tmp dir that the commit renames into place."""
        return f"{dst_dir}__tmp_{uuid.uuid4().hex}"

    def commit(
        self, tmp_dir: str, dst_dir: str, expected_basis=UNCONDITIONAL
    ) -> None:
        """Swap ``tmp_dir`` into place at ``dst_dir`` via two renames.
        Atomic per rename on POSIX; see class docstring for the (documented)
        gap between them."""
        if expected_basis is not UNCONDITIONAL:
            raise NotImplementedError(
                "the rename backend has no version identity to compare — "
                "conditional commits need the ManifestCommitter"
            )
        old = f"{dst_dir}__old_{uuid.uuid4().hex}"
        if os.path.exists(dst_dir):
            os.rename(dst_dir, old)
        os.makedirs(os.path.dirname(dst_dir) or ".", exist_ok=True)
        os.rename(tmp_dir, dst_dir)
        shutil.rmtree(old, ignore_errors=True)

    def resolve(self, dst_dir: str) -> str | None:
        """The logical directory IS the physical directory."""
        return dst_dir if os.path.exists(dst_dir) else None


class ManifestCommitter:
    """Versioned directories + atomic manifest-pointer publication — the
    object-store-safe protocol (single-object PUT is the only atomic
    primitive such stores offer).

    Beyond the current pointer, every commit also drops a sequence-numbered
    marker into ``_commits/`` (advisory metadata — ordering and history;
    the pointer stays the only commit point) and versions can be PINNED by
    name: a pin exempts that version from GC and lets readers resolve it
    later. Pins are what make training runs reproducible — a pipeline pins
    the snapshot it trained on, and re-reads byte-identical input months
    later regardless of how many syncs have run since.

    Concurrency: blind writes (a full sync replacing a partition) publish
    unconditionally — last writer wins, and the sync engine's single-flight
    contract (SURVEY D4) already serializes those. Read-modify-write ops
    (compaction, retraction) pass :meth:`current_version` as
    ``expected_basis`` so the pointer write is a compare-and-swap: a
    concurrent commit turns into an explicit :class:`CommitConflict`
    instead of a silent lost update. GC never collects a version that has
    no commit marker yet until it is ``stage_grace_s`` old — another
    writer may still be producing data inside it.
    """

    versioned = True

    COMMITS = "_commits"
    PIN_PREFIX = "_PIN."

    def __init__(
        self, keep_versions: int = 1, fs=None, stage_grace_s: float = 3600.0
    ):
        # how many SUPERSEDED versions to retain after a commit (readers
        # mid-scan on the old version keep working; a scheduled GC can
        # shorten this once reads are known to have drained)
        self.keep_versions = keep_versions
        # every filesystem touch goes through this interface (see
        # ..sinks.fs) — an S3/GCS binding is a drop-in; the protocol
        # itself never renames when the write was stage()d in place
        self.fs = fs or LocalFS()
        # a v_* dir without a commit marker is either an in-flight stage
        # (another writer, mid-write) or debris from a crash before the
        # marker write; GC only collects it once it is this old
        self.stage_grace_s = stage_grace_s

    def _manifest_path(self, dst_dir: str) -> str:
        return os.path.join(dst_dir, MANIFEST)

    def stage(self, dst_dir: str) -> str:
        """The next version directory itself — the writer produces data
        DIRECTLY at its final path (an uncommitted version is invisible:
        readers only follow the pointer), so commit is pointer-only and no
        directory ever moves. On an object store that is the difference
        between a metadata write and a full per-object copy."""
        self.fs.makedirs(dst_dir)
        return os.path.join(dst_dir, f"v_{uuid.uuid4().hex}")

    def commit(
        self, tmp_dir: str, dst_dir: str, expected_basis=UNCONDITIONAL
    ) -> None:
        """Publish the staged version. With the default ``expected_basis``
        (:data:`UNCONDITIONAL`) the pointer write is a plain PUT — last
        writer wins, the single-flight contract's mode. Passing a basis
        (the version string :meth:`current_version` returned before the
        writer READ the data it is now rewriting, or ``None`` for "nothing
        committed yet") makes the pointer write a compare-and-swap: if
        another writer committed in between, the staged version is
        discarded and :class:`CommitConflict` raised — a read-modify-write
        (compaction, retraction) can never silently overwrite a concurrent
        writer's commit. On S3/GCS the CAS is the store's conditional PUT;
        see :meth:`.fs.LocalFS.put_if`."""
        version = os.path.basename(tmp_dir)
        staged_in_place = version.startswith("v_") and os.path.abspath(
            os.path.dirname(tmp_dir)
        ) == os.path.abspath(dst_dir)
        if not staged_in_place:
            # legacy branch for writers that staged elsewhere: moved in
            # with a copy fallback (EXDEV-safe across filesystems). Object
            # stores cannot move — their fs raises here, which is the
            # point: stage() in place instead.
            version = f"v_{uuid.uuid4().hex}"
            self.fs.makedirs(dst_dir)
            self.fs.move_in(tmp_dir, os.path.join(dst_dir, version))
        # advisory ordering marker, written BEFORE the pointer: a crash
        # in between leaves an orphan marker whose version never became
        # current — history() reports only versions still on disk, and a
        # dangling marker is harmless
        seq = 1 + max((s for s, _ in self._markers(dst_dir)), default=0)
        commits = os.path.join(dst_dir, self.COMMITS)
        self.fs.makedirs(commits)
        self.fs.put(os.path.join(commits, f"{seq:020d}_{version}"), "")
        # the commit point: one atomic pointer write (a single-key PUT —
        # os.replace under LocalFS, PutObject on an object store)
        manifest = self._manifest_path(dst_dir)
        if expected_basis is UNCONDITIONAL:
            self.fs.put(manifest, version)
        elif not self.fs.put_if(manifest, version, expected_basis):
            # lost the race: drop the never-published version and its
            # marker (both invisible to readers), then surface the loss
            self.fs.rmtree(os.path.join(dst_dir, version))
            try:
                self.fs.remove(
                    os.path.join(commits, f"{seq:020d}_{version}")
                )
            except FileNotFoundError:
                pass
            raise CommitConflict(
                dst_dir, expected_basis, self.current_version(dst_dir)
            )
        self._gc(dst_dir, current=version)

    def current_version(self, dst_dir: str) -> str | None:
        """The committed version id (``v_…``) the manifest currently points
        at, or ``None`` when nothing has been committed. Capture this
        BEFORE reading the data a read-modify-write op will rewrite, and
        pass it to :meth:`commit` as ``expected_basis`` — any commit that
        lands in between then raises :class:`CommitConflict` instead of
        being silently overwritten."""
        try:
            return self.fs.read(self._manifest_path(dst_dir)).strip()
        except FileNotFoundError:
            return None

    def resolve(self, dst_dir: str, version: str | None = None) -> str | None:
        """The physical directory of the current committed version (or of an
        explicit retained ``version``), or ``None`` when nothing has ever
        been committed / the version was collected."""
        if version is None:
            try:
                version = self.fs.read(self._manifest_path(dst_dir)).strip()
            except FileNotFoundError:
                return None
        physical = os.path.join(dst_dir, version)
        return physical if self.fs.isdir(physical) else None

    def _markers(self, dst_dir: str):
        commits = os.path.join(dst_dir, self.COMMITS)
        if not self.fs.isdir(commits):
            return
        for name in self.fs.listdir(commits):
            seq_s, _, version = name.partition("_")
            if version.startswith("v_") and seq_s.isdigit():
                yield int(seq_s), version

    def history(self, dst_dir: str) -> list[tuple[int, str]]:
        """(seq, version) for every commit whose data is still retained,
        oldest first. Superseded-and-collected versions are omitted."""
        return sorted(
            (s, v)
            for s, v in self._markers(dst_dir)
            if self.fs.isdir(os.path.join(dst_dir, v))
        )

    def pins(self, dst_dir: str) -> dict[str, str]:
        """name → pinned version, from the ``_PIN.<name>`` pointer files."""
        out: dict[str, str] = {}
        if not self.fs.isdir(dst_dir):
            return out
        for name in self.fs.listdir(dst_dir):
            if name.startswith(self.PIN_PREFIX):
                try:
                    out[name[len(self.PIN_PREFIX) :]] = self.fs.read(
                        os.path.join(dst_dir, name)
                    ).strip()
                except FileNotFoundError:
                    continue  # unpinned between listdir and read
        return out

    def pin(self, dst_dir: str, name: str, version: str | None = None) -> str:
        """Pin ``version`` (default: the current one) under ``name`` — one
        atomic pointer write, same primitive as the manifest. Returns the
        pinned version id."""
        if version is None:
            physical = self.resolve(dst_dir)
            if physical is None:
                raise FileNotFoundError(f"nothing committed at {dst_dir}")
            version = os.path.basename(physical)
        self.fs.put(os.path.join(dst_dir, self.PIN_PREFIX + name), version)
        return version

    def pin_if(
        self, dst_dir: str, name: str, version: str, expected: str | None
    ) -> bool:
        """Conditional pin write — the same compare-and-swap primitive as
        the manifest pointer: publish ``version`` under ``name`` iff the
        pin currently holds ``expected`` (``None`` = must not exist).
        Returns False when the precondition failed. Lets
        :meth:`~.lake.LakeTable.pin_table` create/refresh pins without
        ever overwriting a pin a concurrent writer owns."""
        return self.fs.put_if(
            os.path.join(dst_dir, self.PIN_PREFIX + name), version, expected
        )

    def unpin(self, dst_dir: str, name: str) -> None:
        """Drop a pin; its version becomes eligible for GC at the next
        commit (never removed eagerly — a reader may hold it)."""
        try:
            self.fs.remove(os.path.join(dst_dir, self.PIN_PREFIX + name))
        except FileNotFoundError:
            pass

    def _carry_refs(self, dst_dir: str, versions) -> set[str]:
        """Version dirs referenced by the ``_CARRY`` lists of ``versions``,
        transitively: a retained version that carries files from an older
        version keeps that older dir alive, and so on down the chain.
        Writers flatten chains (carry entries always name a file's
        ORIGINAL physical location, so a re-carry repeats the old entry
        verbatim — see ``functions.statestore.CARRY_MARKER``), which makes
        the fixpoint converge in one step normally; walking the closure
        anyway means a non-flattened marker can never cause GC to delete
        live data."""
        from ..functions.statestore import CARRY_MARKER  # noqa: PLC0415

        refs: set[str] = set()
        seen: set[str] = set()
        frontier = list(versions)
        while frontier:
            v = frontier.pop()
            if v in seen:
                continue
            seen.add(v)
            carry = os.path.join(dst_dir, v, CARRY_MARKER)
            try:
                content = self.fs.read(carry)
            except FileNotFoundError:
                # no carry list, or the dir vanished between listing and
                # read — GC runs AFTER a successful commit, so it must
                # never turn that success into a caller-visible failure
                continue
            for line in content.splitlines():
                head = line.split("/", 1)[0]
                if head.startswith("v_"):
                    refs.add(head)
                    frontier.append(head)
        return refs

    def _gc(self, dst_dir: str, current: str) -> None:
        protected = set(self.pins(dst_dir).values()) | {current}
        versions = [
            d
            for d in self.fs.listdir(dst_dir)
            if d.startswith("v_") and d not in protected
            and self.fs.isdir(os.path.join(dst_dir, d))
        ]
        # keep the newest `keep_versions` superseded dirs — commit-seq
        # order (authoritative), mtime as the fallback for dirs committed
        # before markers existed
        seq_of = {v: s for s, v in self._markers(dst_dir)}
        # a markerless dir younger than the grace window may be another
        # writer's IN-FLIGHT stage (its marker only appears at commit) —
        # collecting it would delete data out from under that writer
        import time  # noqa: PLC0415

        now = time.time()
        versions = [
            d
            for d in versions
            if d in seq_of
            or now - self.fs.getmtime(os.path.join(dst_dir, d))
            >= self.stage_grace_s
        ]
        versions.sort(
            key=lambda d: (
                seq_of.get(d, 0),
                self.fs.getmtime(os.path.join(dst_dir, d)),
            )
        )
        victims = versions[: max(0, len(versions) - self.keep_versions)]
        # carry protection: a pruned maintenance commit publishes a base
        # whose _CARRY lists files still living in OLDER version dirs
        # (functions.statestore.CARRY_MARKER) — those dirs are live data
        # containers, not superseded history. Protect every dir referenced
        # by a version that survives this GC (current, pins, count-retained).
        survivors = (protected | set(versions)) - set(victims)
        referenced = self._carry_refs(dst_dir, survivors)
        victims = [d for d in victims if d not in referenced]
        if victims:
            # re-read pins immediately before deleting: a pin_table()
            # racing this GC may have pinned a victim after the first
            # pins() read above. This narrows (not closes) the window —
            # the pinner's own post-publish verification closes the rest
            # (see LakeTable.pin_table).
            protected = set(self.pins(dst_dir).values()) | {current}
            # a victim spared by that re-read is a survivor now — its
            # _CARRY chain (computed above only for the pre-race survivor
            # set) must survive with it, or we'd delete the carried base
            # out from under the freshly pinned snapshot
            spared = [d for d in victims if d in protected]
            if spared:
                referenced |= self._carry_refs(dst_dir, spared)
        for stale in victims:
            if stale in protected or stale in referenced:
                continue
            self.fs.rmtree(os.path.join(dst_dir, stale))
        # prune commit markers whose version is gone (one marker accrues per
        # sync — unbounded over thousands of syncs). The max-seq marker is
        # always kept so sequence numbering never regresses.
        markers = list(self._markers(dst_dir))
        if markers:
            max_seq = max(s for s, _ in markers)
            for s, v in markers:
                if s != max_seq and not self.fs.isdir(os.path.join(dst_dir, v)):
                    try:
                        self.fs.remove(
                            os.path.join(dst_dir, self.COMMITS, f"{s:020d}_{v}")
                        )
                    except FileNotFoundError:
                        pass
