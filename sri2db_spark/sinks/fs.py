"""Minimal filesystem interface under the commit/state layer.

The :class:`~.committer.ManifestCommitter` protocol was designed so that
its commit point is ONE atomic single-key write — the only atomic
primitive object stores (S3/GCS) offer. This module pins that contract in
code instead of prose: the committer (and the curation-state maintenance
ops that route through it) performs every filesystem touch through this
interface, and the interface deliberately has NO rename/move method for
the staged-in-place write path.

Two implementations:

- :class:`LocalFS` — the default; maps 1:1 onto ``os``/``shutil``.
  ``put`` is write-tmp + ``os.replace`` (atomic on POSIX).
- :class:`ObjectStoreFS` — an object-store-semantics stand-in used by the
  committer test suite: same local backing directory, but ``move_in``
  (the only rename-shaped operation in the interface, needed solely for
  the legacy staged-elsewhere commit branch) raises — a real S3/GCS
  binding cannot rename either. The full committer property/crash suite
  running green against this class is the proof that the protocol never
  reaches for a primitive an object store cannot provide. ``put`` models
  a single-key PUT: the object appears atomically under its final key.

A production S3/GCS binding implements the same ~10 methods over boto3 /
fsspec (``put`` = PutObject, ``walk_files`` = ListObjectsV2, ``rmtree`` =
batched DeleteObjects); the committer, statestore, and their tests carry
over unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid


class LocalFS:
    """``os``/``shutil``-backed implementation — the default everywhere."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def put(self, path: str, data: str) -> None:
        """Atomically publish a small object at ``path`` (the manifest /
        pin / marker write). Local emulation of a single-key PUT: write a
        sibling tmp file, then one atomic ``os.replace``."""
        tmp = os.path.join(
            os.path.dirname(path), f".put.{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def put_if(
        self,
        path: str,
        data: str,
        expected: str | None,
        lock_timeout_s: float = 10.0,
        stale_lock_s: float = 60.0,
    ) -> bool:
        """Conditional single-key PUT (compare-and-swap): publish ``data``
        at ``path`` iff the current content equals ``expected`` (``None``
        = the key must not exist). Returns ``True`` on success, ``False``
        when the precondition failed — the caller lost a race and must
        re-read before retrying.

        On a real object store this IS one server-side primitive — S3
        conditional writes (``If-Match``/``If-None-Match`` on PutObject),
        GCS ``if-generation-match`` — with no extra object involved. The
        local emulation brackets read-check-replace with an ``O_EXCL``
        lock file; note that create-if-absent + delete is itself
        expressible as ``If-None-Match: *`` PUTs, so even the emulation
        strategy ports to stores that only offer the ``None`` flavor. A
        lock left by a crashed holder is stolen after ``stale_lock_s``.
        """
        import time  # noqa: PLC0415

        lock = path + ".cas_lock"
        deadline = time.monotonic() + lock_timeout_s
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(lock) > stale_lock_s:
                        os.remove(lock)  # crashed holder — steal
                        continue
                except FileNotFoundError:
                    continue  # holder just released; retry immediately
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"CAS lock contention on {lock}"
                    ) from None
                time.sleep(0.01)
        try:
            try:
                current: str | None = self.read(path)
            except FileNotFoundError:
                current = None
            if current != expected:
                return False
            self.put(path, data)
            return True
        finally:
            try:
                os.remove(lock)
            except FileNotFoundError:
                pass

    def read(self, path: str) -> str:
        """Contents of a small object; FileNotFoundError when absent."""
        with open(path) as f:
            return f.read()

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def move_in(self, src_dir: str, dst_dir: str) -> None:
        """Move a directory staged OUTSIDE the destination into it — only
        the legacy not-staged-in-place commit branch uses this.
        ``shutil.move`` (rename with copy+delete fallback) so a stage dir
        on another filesystem (e.g. ``tempfile.gettempdir()``) commits
        instead of failing with EXDEV."""
        shutil.move(src_dir, dst_dir)

    def walk_files(self, path: str, suffix: str = ".parquet") -> list[str]:
        """Every file under ``path`` (recursive) with the given suffix —
        the recursive-list primitive state-store reads are built on."""
        out: list[str] = []
        for root, _dirs, files in os.walk(path):
            out.extend(
                os.path.join(root, f) for f in files if f.endswith(suffix)
            )
        return out


class FsspecFS:
    """Adapter from this interface onto an fsspec ``AbstractFileSystem``
    (s3fs, gcsfs, adlfs, ``LocalFileSystem``, …): hand it
    ``fsspec.filesystem("s3")`` and the committer/state layer runs
    unchanged against the real object store. fsspec itself stays an
    optional dependency — this class touches only the instance you pass,
    never imports the package.

    Object-store mapping notes:

    - ``put`` opens the key for write and closes it; on s3fs/gcsfs the
      object appears atomically under its final key when the upload
      completes (single-key PUT) — exactly the one atomic primitive the
      commit protocol is built on.
    - ``getmtime`` of a DIRECTORY (used to age GC candidates and to find
      the newest replay-protected batch dir) has no object-store analog:
      it aggregates ``max(modified)`` over the keys below the prefix
      (empty prefix → 0.0). Key mtimes only move forward on overwrite,
      so "newest batch dir" stays correct.
    - ``move_in`` maps to ``mv(recursive=True)``, which object-store
      backends implement as copy+delete — functional but NOT atomic,
      which is why the committer stages in place and never reaches it on
      these backends.

    Paths are returned exactly as the backend names them; on s3/gcs the
    caller owns prepending the ``s3://`` scheme before handing file lists
    to Spark.
    """

    def __init__(self, fs) -> None:
        self._fs = fs

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(path))

    def isdir(self, path: str) -> bool:
        return bool(self._fs.isdir(path))

    def listdir(self, path: str) -> list[str]:
        return [
            n.rstrip("/").rsplit("/", 1)[-1]
            for n in self._fs.ls(path, detail=False)
        ]

    def makedirs(self, path: str) -> None:
        self._fs.makedirs(path, exist_ok=True)

    def getmtime(self, path: str) -> float:
        if self._fs.isdir(path):
            times = [
                self._mtime(f) for f in self._fs.find(path)
            ]
            return max(times, default=0.0)
        return self._mtime(path)

    def _mtime(self, path: str) -> float:
        m = self._fs.modified(path)
        return m.timestamp() if hasattr(m, "timestamp") else float(m)

    def put(self, path: str, data: str) -> None:
        with self._fs.open(path, "w") as f:
            f.write(data)

    def put_if(self, path: str, data: str, expected: str | None) -> bool:
        """Best-effort CAS over generic fsspec: read-check-put WITHOUT a
        server-side precondition, because ``AbstractFileSystem`` exposes
        none. This catches stale-basis writers (the common lost-update
        case) but two writers racing inside the check-put window can both
        succeed — a production S3/GCS binding must override this with the
        store's conditional write (S3 ``If-Match``/``If-None-Match`` PUT,
        GCS ``if-generation-match``), which closes the window server-side.
        """
        try:
            with self._fs.open(path, "r") as f:
                current: str | None = f.read()
        except FileNotFoundError:
            current = None
        if current != expected:
            return False
        self.put(path, data)
        return True

    def read(self, path: str) -> str:
        with self._fs.open(path, "r") as f:
            return f.read()

    def remove(self, path: str) -> None:
        self._fs.rm_file(path)

    def rmtree(self, path: str) -> None:
        try:
            self._fs.rm(path, recursive=True)
        except FileNotFoundError:
            pass

    def move_in(self, src_dir: str, dst_dir: str) -> None:
        self._fs.mv(src_dir, dst_dir, recursive=True)

    def walk_files(self, path: str, suffix: str = ".parquet") -> list[str]:
        return [f for f in self._fs.find(path) if f.endswith(suffix)]


class ObjectStoreFS(LocalFS):
    """Object-store semantics over a local backing dir: no rename/move.

    See module docstring — running the committer suite against this class
    proves the staged-in-place protocol needs nothing an object store
    lacks. Data writes (Spark parquet jobs) still land as ordinary files,
    exactly as Spark's S3 committers leave task outputs under their final
    keys; only the *protocol* operations go through the interface.
    """

    def move_in(self, src_dir: str, dst_dir: str) -> None:
        raise NotImplementedError(
            "object stores cannot rename directories — stage() the write "
            "inside the destination (the ManifestCommitter's stage() "
            "returns the final version directory for exactly this reason)"
        )
