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
