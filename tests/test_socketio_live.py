"""LIVE socket.io round-trip for the D1 broadcast transport.

The reference e2e-tests its broadcast trigger against a real socket.io
server (/root/reference/test/index.mjs); this build's transport
(streaming/listener.socketio_connect) speaks the public Engine.IO v4 /
Socket.IO v5 long-polling protocol. These tests run it LIVE over real
HTTP sockets — no seams: a threaded WSGI server hosts a socket.io
server app, the client performs the actual handshake / namespace
CONNECT / room join, and an ``update`` event travels the wire to
trigger the listener's sync callback, including the reconnect loop (D2)
and the failed-trigger retry (D3, the reference's 5 s loop at
``client.js:1991-1997,2028-2042``).

Server side: the in-repo :class:`PollingSocketIOServer` (always
available, so nothing here skips). If the optional ``python-socketio``
package is present, the same tests ALSO run against a real
``socketio.Server`` in ``threading`` async mode — thread-safe, unlike
an eventlet-mode server whose hub may never see an emit issued from a
foreign OS thread — via the parametrized fixture.
"""

from __future__ import annotations

import threading
import time
from socketserver import ThreadingMixIn
from wsgiref.simple_server import WSGIServer, make_server

import pytest

from sri2db_spark.streaming.listener import (
    BroadcastListener,
    socketio_connect,
)
from sri2db_spark.streaming.sio_polling import (
    PollingSocketIOClient,
    PollingSocketIOServer,
)

try:
    import socketio as _socketio
except ImportError:
    _socketio = None

SERVER_KINDS = ["inrepo"] + (["python-socketio"] if _socketio else [])


class _ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
    # long-polling needs the client's concurrent GET (listen) and POST
    # (emit) requests served simultaneously; wsgiref's default server is
    # single-threaded and would deadlock the handshake
    daemon_threads = True


class _Hub:
    """Uniform handle over either server implementation."""

    def __init__(self, kind: str):
        self.kind = kind
        self.joined: list[str] = []
        if kind == "inrepo":
            self.sio = PollingSocketIOServer(poll_timeout=0.5)
            app = self.sio

            @self.sio.on("join")
            def _join(sid, room):
                self.joined.append(room)
                self.sio.enter_room(sid, room)

        else:
            self.sio = _socketio.Server(async_mode="threading")
            app = _socketio.WSGIApp(self.sio)

            @self.sio.on("join")
            def _join(sid, room):
                self.joined.append(room)
                self.sio.enter_room(sid, room)

        self.httpd = make_server(
            "127.0.0.1", 0, app, server_class=_ThreadingWSGIServer
        )
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def emit(self, event, data, room):
        self.sio.emit(event, data, room=room)

    def stop(self):
        self.httpd.shutdown()


@pytest.fixture(params=SERVER_KINDS)
def hub(request):
    h = _Hub(request.param)
    try:
        yield h
    finally:
        h.stop()


def _wait(pred, timeout=10.0, interval=0.02) -> bool:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(interval)
    return pred()


def test_live_event_triggers_sync(hub):
    """D1 end to end on the wire: handshake → join (query string stripped,
    reference client.js:1988) → server room emit → sync fires."""
    fired = []
    lst = BroadcastListener(
        connect=socketio_connect(hub.url, "/things?expand=FULL"),
        sync_fn=lambda: fired.append(1),
    )
    lst.start()
    try:
        assert _wait(lambda: hub.joined), "join never reached the server"
        assert hub.joined == ["/things"]
        hub.emit("update", {"href": "/things/1"}, room="/things")
        assert _wait(lambda: fired), "update event never triggered a sync"
        assert lst.events_seen >= 1
    finally:
        lst.stop()


def test_live_room_isolation(hub):
    """An emit to a DIFFERENT room must not trigger this listener."""
    fired = []
    lst = BroadcastListener(
        connect=socketio_connect(hub.url, "/things"),
        sync_fn=lambda: fired.append(1),
    )
    lst.start()
    try:
        assert _wait(lambda: hub.joined)
        hub.emit("update", {"href": "/other/1"}, room="/other")
        hub.emit("update", {"href": "/things/9"}, room="/things")
        assert _wait(lambda: fired)
        # only the /things event got through; give the stray a beat to
        # prove it never lands
        time.sleep(0.3)
        assert lst.events_seen == 1
    finally:
        lst.stop()


def test_live_reconnect_after_server_drop(hub):
    """D2: the server drops the session; the listener reconnects (joins
    again) and subsequent events still trigger syncs."""
    if hub.kind != "inrepo":
        pytest.skip("close_session drop hook is an in-repo server feature")
    fired = []
    lst = BroadcastListener(
        connect=socketio_connect(hub.url, "/things"),
        sync_fn=lambda: fired.append(1),
        retry_interval=0.2,  # keep the test fast; default is 5 s (D2)
    )
    lst.start()
    try:
        assert _wait(lambda: hub.joined)
        for sid in hub.sio.session_ids:
            hub.sio.close_session(sid)
        # reconnect = a SECOND join arriving on a fresh session
        assert _wait(lambda: len(hub.joined) >= 2), "no reconnect join"
        hub.emit("update", {"href": "/things/2"}, room="/things")
        assert _wait(lambda: fired)
        assert lst.errors >= 1  # the drop surfaced as a counted error
    finally:
        lst.stop()


def test_live_failed_trigger_retries(hub):
    """D3: a sync that fails keeps retrying on the interval until it
    succeeds (reference client.js:2028-2042), driven by a LIVE event."""
    attempts = []

    def flaky_sync():
        attempts.append(time.monotonic())
        if len(attempts) < 3:
            raise RuntimeError("injected trigger failure")
        return None

    lst = BroadcastListener(
        connect=socketio_connect(hub.url, "/things"),
        sync_fn=flaky_sync,
        retry_interval=0.25,  # scaled-down stand-in for the 5 s loop
    )
    lst.start()
    try:
        assert _wait(lambda: hub.joined)
        hub.emit("update", {"href": "/things/3"}, room="/things")
        assert _wait(lambda: len(attempts) >= 3), "sync was not retried"
        assert lst.errors >= 2 and lst.syncs_run == 1
        # retries were spaced by the interval, not a hot loop
        assert attempts[1] - attempts[0] >= 0.2
        assert attempts[2] - attempts[1] >= 0.2
    finally:
        lst.stop()


def test_live_default_retry_interval_is_reference_5s():
    """The production default matches the reference's 5 s loops
    (client.js:1997,2039); tests above shrink it only for speed."""
    from sri2db_spark.streaming.listener import RETRY_INTERVAL_S

    assert RETRY_INTERVAL_S == 5.0
    assert BroadcastListener(connect=object, sync_fn=object).retry_interval == 5.0


def test_connect_refused_surfaces_server_payload():
    """A server that refuses the namespace CONNECT (auth etc.) answers
    with a '44' CONNECT_ERROR packet; the client must surface its payload
    immediately instead of spinning to the ack timeout."""

    class _Refusing(PollingSocketIOServer):
        def _receive(self, sid, pkt):
            if pkt.startswith("40"):
                sess = self._sessions.get(sid)
                if sess is not None:
                    sess.queue.put('44{"message":"auth required"}')
            else:
                super()._receive(sid, pkt)

    sio = _Refusing(poll_timeout=0.5)
    httpd = make_server("127.0.0.1", 0, sio, server_class=_ThreadingWSGIServer)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        c = PollingSocketIOClient()
        t0 = time.monotonic()
        with pytest.raises(ConnectionError, match="auth required"):
            c.connect(f"http://127.0.0.1:{httpd.server_address[1]}")
        assert time.monotonic() - t0 < 4.0, "refusal waited for the timeout"
        assert not c.connected
    finally:
        httpd.shutdown()


def test_server_reaps_idle_sessions():
    """A client that dies without '41'/'1' must not leak its session: the
    hub reaps anything idle past session_timeout, and emits only reach
    sessions that completed the Socket.IO CONNECT."""
    hub = _Hub("inrepo")
    hub.sio._session_timeout = 0.3
    try:
        c = PollingSocketIOClient()
        c.connect(hub.url)
        assert len(hub.sio.session_ids) == 1
        # simulate a dead client: stop polling without closing
        c._stop.set()
        c._poller.join(5)
        time.sleep(0.5)
        hub.sio.emit("update", {"x": 1}, room=None)  # emit triggers the reap
        assert hub.sio.session_ids == []
    finally:
        hub.stop()


def test_polling_client_against_inrepo_server_direct():
    """Transport-level check without the listener: connect, ping/pong
    keepalive on an idle poll, emit both directions, clean disconnect."""
    hub = _Hub("inrepo")
    got = []
    try:
        c = PollingSocketIOClient()
        c.on("greeting", lambda data: got.append(data))

        @hub.sio.on("hello")
        def _hello(sid, data):
            hub.sio.emit("greeting", {"and": data}, room=None)

        c.connect(hub.url)
        assert c.connected
        c.emit("hello", "world")
        assert _wait(lambda: got, timeout=5)
        assert got == [{"and": "world"}]
        # idle long enough to cross the server's 0.5 s poll timeout so a
        # ping/pong round-trip happens; the session must stay connected
        time.sleep(1.2)
        assert c.connected
        c.disconnect()
        assert not c.connected
        assert _wait(lambda: not hub.sio.session_ids, timeout=5)
    finally:
        hub.stop()
