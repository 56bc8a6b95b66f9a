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
  Data is moved (never rewritten) to ``<dst>/v_<uuid>/`` and the commit is
  ONE atomic publication: writing the tiny ``_MANIFEST`` file that names
  the current version. Readers resolve through the manifest, so they
  always see a complete version — a crash before the manifest write
  leaves the previous version live; a crash after it leaves the new one
  live; there is no in-between. On an object store the manifest write is
  a single-key PUT (atomic); on a local filesystem it is
  ``os.replace`` (atomic file rename). Old versions are garbage-collected
  AFTER publication, and collection failures are harmless (orphan
  directories, never dangling pointers).

Both satisfy the same two-method protocol, so the lake sink, the watermark
store, and the curation-state compactor take a ``committer`` and stay
backend-agnostic. The operator layer maps unchanged onto Delta/Iceberg
(whose transaction logs are exactly the manifest idea, generalized).
"""

from __future__ import annotations

import os
import shutil
import uuid

MANIFEST = "_MANIFEST"


class RenameCommitter:
    """POSIX rename swap — the local-filesystem default."""

    #: readers can point Spark straight at the logical directory
    versioned = False

    def commit(self, tmp_dir: str, dst_dir: str) -> None:
        """Swap ``tmp_dir`` into place at ``dst_dir`` via two renames.
        Atomic per rename on POSIX; see class docstring for the (documented)
        gap between them."""
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
    primitive such stores offer)."""

    versioned = True

    def __init__(self, keep_versions: int = 1):
        # how many SUPERSEDED versions to retain after a commit (readers
        # mid-scan on the old version keep working; a scheduled GC can
        # shorten this once reads are known to have drained)
        self.keep_versions = keep_versions

    def _manifest_path(self, dst_dir: str) -> str:
        return os.path.join(dst_dir, MANIFEST)

    def commit(self, tmp_dir: str, dst_dir: str) -> None:
        version = f"v_{uuid.uuid4().hex}"
        os.makedirs(dst_dir, exist_ok=True)
        os.rename(tmp_dir, os.path.join(dst_dir, version))
        # the commit point: one atomic pointer write (os.replace locally;
        # a single-key PUT on an object store)
        tmp_manifest = os.path.join(dst_dir, f".{MANIFEST}.{uuid.uuid4().hex}")
        with open(tmp_manifest, "w") as f:
            f.write(version)
        os.replace(tmp_manifest, self._manifest_path(dst_dir))
        self._gc(dst_dir, current=version)

    def resolve(self, dst_dir: str) -> str | None:
        """The physical directory of the current committed version, or
        ``None`` when nothing has ever been committed."""
        try:
            with open(self._manifest_path(dst_dir)) as f:
                version = f.read().strip()
        except FileNotFoundError:
            return None
        physical = os.path.join(dst_dir, version)
        return physical if os.path.isdir(physical) else None

    def _gc(self, dst_dir: str, current: str) -> None:
        versions = sorted(
            d
            for d in os.listdir(dst_dir)
            if d.startswith("v_") and d != current
            and os.path.isdir(os.path.join(dst_dir, d))
        )
        # keep the newest `keep_versions` superseded dirs (mtime order)
        versions.sort(
            key=lambda d: os.path.getmtime(os.path.join(dst_dir, d))
        )
        for stale in versions[: max(0, len(versions) - self.keep_versions)]:
            shutil.rmtree(os.path.join(dst_dir, stale), ignore_errors=True)
