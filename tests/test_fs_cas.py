"""The filesystem layer's compare-and-swap contract.

Covers the round-7 hardening: (1) unconditional pointer writes serialize
against conditional ones (a blind sync publish can no longer be silently
lost to a CAS writer whose read preceded it), (2) the pointer lock is an
OS advisory lock (flock) on a persistent dot-named file — crashed holders
release via the kernel (no staleness heuristic, no steal race) and lock
files can never shadow pointer prefix scans, (3) generic fsspec CAS is
opt-in and
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


def test_crashed_holder_does_not_wedge_the_lock(tmp_path):
    """The pointer lock is an OS advisory lock (flock) on a persistent
    dot-named file: a crashed holder's lock is released by the KERNEL
    when its process dies, so the on-disk lock file left behind holds
    nothing — the next writer proceeds immediately, with no staleness
    heuristic and no steal protocol (whose mtime-check-then-rename could
    previously rename away a FRESH lock)."""
    fs = LocalFS()
    path = str(tmp_path / "ptr")
    fs.put(path, "A")
    lock = str(tmp_path / ".ptr.cas_lock")
    assert os.path.exists(lock)  # persistent from the first put
    old = time.time() - 3600
    os.utime(lock, (old, old))  # looks ancient — irrelevant to flock
    assert fs.put_if(path, "B", "A") is True
    assert fs.read(path) == "B"
    # the lock file is NEVER unlinked: removing it while a holder has it
    # flocked would let the next acquirer lock a fresh inode and break
    # mutual exclusion (the classic unlink-vs-flock race)
    assert os.path.exists(lock)


def test_lock_file_name_cannot_shadow_pointer_prefix_scans(tmp_path):
    """The lock file of a ``_PIN.<name>`` pointer must not itself match
    the ``_PIN.`` prefix: ManifestCommitter.pins() listdir-scans the
    pointer directory, and a ``_PIN.<name>.cas_lock`` entry would read
    back as a phantom pin (crashing GC mid-commit or permanently
    protecting nothing). Dot-prefixed lock names are invisible to every
    pointer prefix scan."""
    fs = LocalFS()
    pin = str(tmp_path / "_PIN.cut1")
    fs.put(pin, "v_abc")
    names = os.listdir(tmp_path)
    assert "_PIN.cut1" in names
    assert all(
        not n.startswith("_PIN.") or n == "_PIN.cut1" for n in names
    ), names
    assert any(n == "._PIN.cut1.cas_lock" for n in names)


def test_live_holder_blocks_until_release_then_times_out_cleanly(tmp_path):
    """A LIVE holder (fd flocked, process alive) blocks a second writer:
    a short-timeout put_if raises TimeoutError while held, succeeds after
    release."""
    fs = LocalFS()
    path = str(tmp_path / "ptr")
    fs.put(path, "A")
    fd = fs._lock_pointer(path, lock_timeout_s=5.0, stale_lock_s=60.0)
    try:
        with pytest.raises(TimeoutError):
            fs.put_if(path, "B", "A", lock_timeout_s=0.2)
        assert fs.read(path) == "A"  # nothing slipped through
    finally:
        os.close(fd)  # release
    assert fs.put_if(path, "B", "A") is True
    assert fs.read(path) == "B"


def test_concurrent_cas_increments_lose_no_updates(tmp_path):
    """Mutual exclusion under real concurrency: N threads each advance a
    counter via read→put_if(expected=read) retry loops; every one of the
    N×M increments lands (flock between distinct fds serializes even
    within one process)."""
    fs = LocalFS()
    path = str(tmp_path / "ctr")
    fs.put(path, "0")

    def bump(times: int) -> None:
        for _ in range(times):
            while True:
                cur = fs.read(path)
                if fs.put_if(path, str(int(cur) + 1), cur):
                    break

    threads = [threading.Thread(target=bump, args=(25,)) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert fs.read(path) == "100"


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


def test_precondition_detection_is_structured_not_substring():
    """A failed conditional PUT is recognized by STRUCTURED error fields
    (class name, status attributes, botocore response dict) — never by
    substring-scanning the repr, where a request id containing '412'
    would silently turn an infrastructure failure into 'lost the race'
    (rmtree'ing a successfully staged version and raising
    CommitConflict instead of surfacing the outage)."""
    from sri2db_spark.sinks.fs import _is_precondition_failure

    # true positives: realistic shapes of the three paths we bind
    class PreconditionFailed(Exception):  # fake / s3fs-translated name
        pass

    assert _is_precondition_failure(PreconditionFailed("nope"))

    class HttpError(Exception):  # gcsfs.retry.HttpError carries .code
        def __init__(self, code):
            self.code = code

    assert _is_precondition_failure(HttpError(412))
    assert not _is_precondition_failure(HttpError(503))

    class ClientError(Exception):  # botocore shape
        def __init__(self, code, status):
            self.response = {
                "Error": {"Code": code},
                "ResponseMetadata": {"HTTPStatusCode": status},
            }

    assert _is_precondition_failure(ClientError("PreconditionFailed", 412))
    assert not _is_precondition_failure(ClientError("SlowDown", 503))

    # wrapped one level (s3fs translates botocore errors)
    wrapped = OSError("conditional write failed")
    wrapped.__cause__ = ClientError("PreconditionFailed", 412)
    assert _is_precondition_failure(wrapped)

    # the case the substring scan got wrong: '412' in free text only
    assert not _is_precondition_failure(
        RuntimeError("throttled; RequestId: A412BCD, retry later")
    )
    assert not _is_precondition_failure(
        OSError("wrote 412 bytes before connection reset")
    )

    # implicit __context__ must NOT classify: an unrelated error raised
    # while HANDLING a genuine 412 (cleanup/retry failure) carries the 412
    # in __context__; treating it as a benign lost race would swallow the
    # real infrastructure error
    try:
        try:
            raise ClientError("PreconditionFailed", 412)
        except ClientError:
            raise OSError("cleanup failed: disk full")  # noqa: B904
    except OSError as e:
        implicit = e
    assert implicit.__context__ is not None and implicit.__cause__ is None
    assert not _is_precondition_failure(implicit)

    # ...while the same shape chained EXPLICITLY (raise ... from, the
    # s3fs/gcsfs translation idiom) still classifies
    try:
        try:
            raise ClientError("PreconditionFailed", 412)
        except ClientError as ce:
            raise OSError("conditional write failed") from ce
    except OSError as e:
        explicit = e
    assert _is_precondition_failure(explicit)


def test_unrecognized_conditional_put_error_reraises(tmp_path):
    """S3FsspecFS.put_if must RE-RAISE an error that is not a
    precondition failure — returning False would misreport an outage as
    a benign lost race."""
    fake = FakeFsspecFileSystem()
    fs = S3FsspecFS(fake)
    fs.put(str(tmp_path / "k"), "A")

    def explode(path, data, **kw):
        raise RuntimeError("throttled; RequestId: A412BCD")

    fake.pipe_file = explode
    with pytest.raises(RuntimeError, match="throttled"):
        fs.put_if(str(tmp_path / "k"), "B", "A")


def test_cross_process_cas_counter_loses_no_update(tmp_path):
    """Machine proof of the flock CAS across real OS PROCESSES (the
    in-repo thread tests share a Python process; two DRIVERS on one
    host do not): 4 processes each land 25 compare-and-swap increments
    on one pointer — the final value equals the total iff no successful
    CAS was ever overwritten and no two writers shared the critical
    section."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ptr = str(tmp_path / "_COUNTER")
    worker = r"""
import sys
sys.path.insert(0, %r)
from sri2db_spark.sinks.fs import LocalFS
fs = LocalFS()
ptr = %r
landed = 0
while landed < 25:
    try:
        cur = fs.read(ptr)
    except FileNotFoundError:
        cur = None
    nxt = str((int(cur) if cur is not None else 0) + 1)
    if fs.put_if(ptr, nxt, cur):
        landed += 1
print("landed", landed)
""" % (repo, ptr)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for _ in range(4)
    ]
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err[-500:]
        assert "landed 25" in out
    assert LocalFS().read(ptr) == "100"
