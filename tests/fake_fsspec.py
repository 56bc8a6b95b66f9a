"""A minimal fsspec-shaped filesystem over the local disk, for exercising
:class:`sri2db_spark.sinks.fs.FsspecFS` without the fsspec package.

Implements exactly the ``AbstractFileSystem`` surface the adapter calls —
``exists isdir ls makedirs open rm_file rm mv find modified`` — with
object-store-faithful semantics: a write ``open()`` buffers to a sibling
tmp file and publishes the key atomically on close (the PUT-on-close
behavior of s3fs/gcsfs), so the committer crash-injection tests (which
intercept the final ``os.replace``) exercise the same crash point they do
on LocalFS.
"""

from __future__ import annotations

import contextlib
import datetime
import os
import shutil
import uuid


class _PutOnClose:
    """Write handle that publishes the object atomically on close."""

    def __init__(self, path: str) -> None:
        self._path = path
        self._tmp = os.path.join(
            os.path.dirname(path), f".upload.{uuid.uuid4().hex}"
        )
        self._f = open(self._tmp, "w")

    def write(self, data: str) -> int:
        return self._f.write(data)

    def close(self) -> None:
        self._f.close()
        os.replace(self._tmp, self._path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        else:  # crashed upload: no object appears, tmp is garbage
            self._f.close()
            with contextlib.suppress(FileNotFoundError):
                os.remove(self._tmp)
        return False


class PreconditionFailed(Exception):
    """Stand-in for the HTTP 412 a real store raises when a conditional
    PUT's precondition does not hold (botocore ClientError
    ``PreconditionFailed`` on S3, gcsfs HttpError ``conditionNotMet`` on
    GCS) — the message carries the markers
    :func:`sri2db_spark.sinks.fs._is_precondition_failure` matches."""

    def __init__(self, detail: str) -> None:
        super().__init__(f"412 Precondition Failed: {detail}")


class FakeFsspecFileSystem:
    """Local-disk stand-in with fsspec's method names and semantics,
    including the conditional-PUT surface of s3fs/gcsfs: ``info`` returns
    an ``ETag`` (content MD5, exactly what S3 reports for single-part
    uploads) and a ``generation`` (monotonic per overwrite, GCS-style),
    and ``pipe_file`` honors ``IfMatch``/``IfNoneMatch`` /
    ``if_generation_match`` by raising :class:`PreconditionFailed` — so
    the server-side-CAS bindings are exercised end to end without the
    cloud SDKs."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def ls(self, path: str, detail: bool = False):
        assert detail is False  # the adapter only uses detail=False
        return [os.path.join(path, n) for n in os.listdir(path)]

    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def open(self, path: str, mode: str = "r"):
        if mode == "w":
            return _PutOnClose(path)
        return open(path, mode)

    def rm_file(self, path: str) -> None:
        os.remove(path)

    def rm(self, path: str, recursive: bool = False) -> None:
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        if recursive and os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)

    def mv(self, src: str, dst: str, recursive: bool = False) -> None:
        # object stores implement mv as copy+delete; model that (never
        # a rename) so code relying on mv-atomicity would fail here too
        if os.path.isdir(src):
            shutil.copytree(src, dst)
            shutil.rmtree(src)
        else:
            shutil.copy2(src, dst)
            os.remove(src)

    def find(self, path: str) -> list[str]:
        out: list[str] = []
        for root, _dirs, files in os.walk(path):
            out.extend(os.path.join(root, f) for f in files)
        return sorted(out)

    def modified(self, path: str) -> datetime.datetime:
        if os.path.isdir(path):  # real object stores raise on prefixes
            raise IsADirectoryError(path)
        return datetime.datetime.fromtimestamp(
            os.path.getmtime(path), tz=datetime.timezone.utc
        )

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def info(self, path: str) -> dict:
        if not os.path.isfile(path):
            raise FileNotFoundError(path)
        with open(path, "rb") as f:
            body = f.read()
        import hashlib

        st = os.stat(path)
        return {
            "name": path,
            "size": st.st_size,
            # S3 single-part ETag IS the quoted content MD5
            "ETag": f'"{hashlib.md5(body).hexdigest()}"',
            # GCS generation: strictly increases on every overwrite
            "generation": st.st_mtime_ns,
        }

    def pipe_file(
        self,
        path: str,
        value: bytes,
        IfMatch: str | None = None,  # noqa: N803 — boto3 casing, as s3fs forwards
        IfNoneMatch: str | None = None,  # noqa: N803
        if_generation_match: int | None = None,
    ) -> None:
        """Atomic single-key PUT with the stores' conditional semantics:
        the precondition is evaluated against the CURRENT object and the
        write is published (or refused) atomically — no window."""
        current = self.info(path) if os.path.isfile(path) else None
        if IfNoneMatch == "*" and current is not None:
            raise PreconditionFailed(f"{path} exists (If-None-Match: *)")
        if IfMatch is not None and (
            current is None or current["ETag"] != IfMatch
        ):
            raise PreconditionFailed(f"{path} ETag mismatch (If-Match)")
        if if_generation_match is not None:
            gen = 0 if current is None else current["generation"]
            if gen != if_generation_match:
                raise PreconditionFailed(
                    f"{path} generation {gen} != {if_generation_match}"
                )
        tmp = os.path.join(
            os.path.dirname(path), f".pipe.{uuid.uuid4().hex}"
        )
        with open(tmp, "wb") as f:
            f.write(value)
        os.replace(tmp, path)
