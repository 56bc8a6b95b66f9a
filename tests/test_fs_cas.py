"""The filesystem layer's compare-and-swap contract.

Covers the round-7 hardening: (1) unconditional pointer writes serialize
against conditional ones (a blind sync publish can no longer be silently
lost to a CAS writer whose read preceded it), (2) stale-lock stealing is
single-winner (rename-to-unique), (3) generic fsspec CAS is opt-in and
the S3/GCS bindings close the read-put window with the store's own
conditional PUT — proven by the same interleaving losing an update on the
weak path and failing cleanly on the server-side path.
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from sri2db_spark.sinks.fs import (
    FsspecFS,
    GcsFsspecFS,
    LocalFS,
    ObjectStoreFS,
    S3FsspecFS,
    WeakCasError,
)

from .fake_fsspec import FakeFsspecFileSystem


def test_unconditional_put_serializes_with_cas(tmp_path, monkeypatch):
    """ADVICE r6: LocalFS.put must take the same pointer lock as put_if.
    While a CAS writer is inside its read-check-replace window, an
    unconditional put blocks instead of slipping into the window and
    being overwritten by the CAS's replace."""
    fs = LocalFS()
    path = str(tmp_path / "ptr")
    fs.put(path, "A")

    in_window = threading.Event()
    release = threading.Event()
    orig_read = LocalFS.read

    def read_and_hold(self, p):
        value = orig_read(self, p)
        if p == path and not in_window.is_set():
            in_window.set()
            release.wait(10)
        return value

    monkeypatch.setattr(LocalFS, "read", read_and_hold)
    cas_result: list[bool] = []
    cas = threading.Thread(
        target=lambda: cas_result.append(fs.put_if(path, "B", "A"))
    )
    cas.start()
    assert in_window.wait(10)

    put_done: list[int] = []
    blind = threading.Thread(
        target=lambda: (fs.put(path, "C"), put_done.append(1))
    )
    blind.start()
    time.sleep(0.3)
    # the unconditional writer is parked on the pointer lock, not inside
    # the CAS window
    assert not put_done
    release.set()
    cas.join(10)
    blind.join(10)
    assert cas_result == [True]
    # serialized order: CAS published B, then the blind put published C —
    # C is the final value, nothing was silently lost
    assert fs.read(path) == "C"


def test_stale_lock_steal_is_single_winner(tmp_path):
    """A crashed holder's lock is stolen via rename-to-unique + remove:
    the steal succeeds, the CAS completes, and a racer whose rename loses
    retries instead of removing the winner's fresh lock."""
    fs = LocalFS()
    path = str(tmp_path / "ptr")
    fs.put(path, "A")
    lock = path + ".cas_lock"
    open(lock, "w").close()
    old = time.time() - 3600
    os.utime(lock, (old, old))  # crashed an hour ago
    assert fs.put_if(path, "B", "A", stale_lock_s=60.0) is True
    assert fs.read(path) == "B"
    assert not os.path.exists(lock)
    assert not any(n.startswith(".cas_lock.steal") for n in os.listdir(tmp_path))


def test_losing_stealer_retries_not_removes(tmp_path, monkeypatch):
    """When the stale lock vanishes under a stealer (the other stealer's
    rename won), its own rename raises FileNotFoundError and it loops —
    it never removes anything."""
    fs = LocalFS()
    path = str(tmp_path / "ptr")
    fs.put(path, "A")
    lock = path + ".cas_lock"
    open(lock, "w").close()
    old = time.time() - 3600
    os.utime(lock, (old, old))

    removed: list[str] = []
    orig_rename, orig_remove = os.rename, os.remove
    raced = [False]

    def rename_raced(src, dst):
        if src == lock and not raced[0]:
            raced[0] = True
            orig_remove(lock)  # the OTHER stealer wins first
            raise FileNotFoundError(src)
        return orig_rename(src, dst)

    def remove_spy(p):
        removed.append(p)
        return orig_remove(p)

    monkeypatch.setattr(os, "rename", rename_raced)
    monkeypatch.setattr(os, "remove", remove_spy)
    assert fs.put_if(path, "B", "A", stale_lock_s=60.0) is True
    assert fs.read(path) == "B"
    # the loser never removed the (now-missing) lock path directly while
    # racing — only its own fresh lock at release time
    assert lock in removed  # its own release
    assert removed.count(lock) == 1


def test_fsspec_weak_cas_is_opt_in(tmp_path):
    fake = FakeFsspecFileSystem()
    path = str(tmp_path / "ptr")
    strict = FsspecFS(fake)
    strict.put(path, "v1")  # unconditional writes stay available
    with pytest.raises(WeakCasError, match="allow_weak_cas"):
        strict.put_if(path, "v2", "v1")
    assert FsspecFS(fake, allow_weak_cas=True).put_if(path, "v2", "v1") is True


@pytest.mark.parametrize("cls", [S3FsspecFS, GcsFsspecFS])
def test_conditional_put_binding_basics(tmp_path, cls):
    fake = FakeFsspecFileSystem()
    fs = cls(fake)
    path = str(tmp_path / "ptr")
    assert fs.put_if(path, "v1", None) is True  # If-None-Match create
    assert fs.put_if(path, "x", None) is False  # key exists
    assert fs.put_if(path, "v2", "v1") is True  # matching basis
    assert fs.put_if(path, "x", "v1") is False  # stale basis
    assert fs.read(path) == "v2"


@pytest.mark.parametrize("cls", [S3FsspecFS, GcsFsspecFS])
def test_server_side_cas_closes_the_window(tmp_path, cls, monkeypatch):
    """The racing-writer interleaving: an interloper's PUT lands between
    our content check and our PUT. Weak CAS silently clobbers it (the
    interloper's update is LOST); the server-side binding gets a 412 from
    the store and reports the lost race."""
    fake = FakeFsspecFileSystem()
    path = str(tmp_path / "ptr")

    # --- weak path: interloper's write is silently lost
    weak = FsspecFS(fake, allow_weak_cas=True)
    weak.put(path, "v1")
    fired = [False]
    orig_put = FsspecFS.put

    def put_with_interloper(self, p, data):
        if not fired[0]:
            fired[0] = True
            orig_put(self, p, "intruder")  # lands inside the window
        return orig_put(self, p, data)

    monkeypatch.setattr(FsspecFS, "put", put_with_interloper)
    assert weak.put_if(path, "v2", "v1") is True  # both writers "won"
    assert weak.read(path) == "v2"  # the intruder's update is gone
    monkeypatch.setattr(FsspecFS, "put", orig_put)

    # --- server-side path: same interleaving, store rejects with 412
    strong = cls(fake)
    path2 = str(tmp_path / "ptr2")
    strong.put(path2, "v1")
    fired2 = [False]
    orig_pipe = fake.pipe_file

    def pipe_with_interloper(p, value, **kw):
        if not fired2[0]:
            fired2[0] = True
            orig_pipe(p, b"intruder")  # unconditional PUT wins the race
        return orig_pipe(p, value, **kw)

    fake.pipe_file = pipe_with_interloper
    assert strong.put_if(path2, "v2", "v1") is False  # clean lost-race
    assert strong.read(path2) == "intruder"  # nothing was clobbered


def test_non_precondition_errors_propagate(tmp_path):
    fake = FakeFsspecFileSystem()
    fs = S3FsspecFS(fake)
    path = str(tmp_path / "ptr")
    fs.put(path, "v1")

    def boom(p, value, **kw):
        raise RuntimeError("socket reset mid-upload")

    fake.pipe_file = boom
    with pytest.raises(RuntimeError, match="socket reset"):
        fs.put_if(path, "v2", "v1")


def test_spark_path_qualification(tmp_path):
    assert LocalFS().spark_path("/a/b") == "/a/b"
    assert ObjectStoreFS().spark_path("/a/b") == "/a/b"
    fake = FakeFsspecFileSystem()
    assert FsspecFS(fake).spark_path("/a/b") == "/a/b"  # no protocol

    class WithProtocol(FakeFsspecFileSystem):
        def unstrip_protocol(self, path: str) -> str:
            return f"s3://{path.lstrip('/')}"

    assert (
        FsspecFS(WithProtocol()).spark_path("/bucket/key")
        == "s3://bucket/key"
    )


def test_size(tmp_path):
    p = str(tmp_path / "f")
    with open(p, "w") as f:
        f.write("12345")
    assert LocalFS().size(p) == 5
    assert FsspecFS(FakeFsspecFileSystem()).size(p) == 5


def test_python_dash_m_entry_point(tmp_path):
    """The command error messages print — `python -m sri2db_spark
    output-compact` — must actually exist (r6 verdict: it pointed at a
    missing __main__)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "sri2db_spark", "output-compact", "--help"],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": repo},
        cwd=str(tmp_path),
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "output-compact" in r.stdout


def test_rename_committer_rejects_fsspec_binding():
    from sri2db_spark.sinks.committer import RenameCommitter
    from sri2db_spark.sinks.fs import FsspecFS

    with pytest.raises(ValueError, match="ManifestCommitter"):
        RenameCommitter(fs=FsspecFS(FakeFsspecFileSystem()))
