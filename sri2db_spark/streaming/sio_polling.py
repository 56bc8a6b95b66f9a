"""Minimal Socket.IO-over-Engine.IO long-polling transport (stdlib only).

The reference's broadcast listener is a production path: it connects a
socket.io client to ``broadcastUrl`` and triggers a delta sync per
``update`` event (``/root/reference/src/lib/client.js:1981-2047``). The
engine implements that protocol against the public ``python-socketio``
package (:mod:`.listener`), but that optional dependency may be absent —
in which case the transport could never actually RUN. This module closes
that gap with a dependency-free implementation of the public wire
protocol, long-polling only (no websocket upgrade):

* Engine.IO v4 (``EIO=4``): handshake ``GET ?EIO=4&transport=polling`` →
  ``0{json}`` open packet with the session id; subsequent polling ``GET``
  returns packets joined by the 0x1e record separator; ``POST`` sends
  them. Packet types used: ``0`` open, ``1`` close, ``2`` ping, ``3``
  pong, ``4`` message, ``6`` noop.
* Socket.IO v5 rides inside Engine.IO ``4`` messages: ``40`` CONNECT
  (server acks with ``40{"sid":…}``), ``41`` DISCONNECT, ``42["event",
  args…]`` EVENT. Default namespace ``/`` only — all the reference uses.

:class:`PollingSocketIOClient` exposes the subset of the
``socketio.Client`` surface the listener's transport consumes
(``on``/``connect``/``connected``/``emit``/``disconnect``), so it slots
behind :func:`..streaming.listener.socketio_connect` unchanged.
:class:`PollingSocketIOServer` is a WSGI app with the matching server
subset (``on``/``enter_room``/``emit``) used by the live round-trip test
and usable as a self-hosted broadcast hub.

Binary attachments and websocket upgrade are deliberately out of scope:
the SRI broadcast payloads are small JSON objects and polling is a fully
supported permanent transport in the public protocol.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
import uuid
from collections import defaultdict
from queue import Empty, Queue

SEP = "\x1e"  # Engine.IO v4 polling payload record separator


def _split_packets(body: str) -> list[str]:
    return [p for p in body.split(SEP) if p]


class PollingSocketIOClient:
    """Socket.IO client over Engine.IO v4 HTTP long-polling, stdlib only.

    Surface parity with ``socketio.Client`` where the listener needs it:
    ``on(event, handler)``, ``connect(url)`` (blocks until the namespace
    CONNECT is acked, raises on failure), ``connected``, ``emit(event,
    data)``, ``disconnect()``.
    """

    def __init__(self, request_timeout: float = 10.0) -> None:
        self.connected = False
        self._handlers: dict[str, object] = {}
        self._base: str | None = None
        self._sid: str | None = None
        self._stop = threading.Event()
        self._poller: threading.Thread | None = None
        self._post_lock = threading.Lock()
        self._timeout = request_timeout
        self._connect_error: str | None = None

    # -- public surface ------------------------------------------------------

    def on(self, event: str, handler=None):
        if handler is not None:
            self._handlers[event] = handler
            return handler

        def _decorator(fn):
            self._handlers[event] = fn
            return fn

        return _decorator

    def connect(self, url: str, wait_timeout: float = 5.0) -> None:
        self._base = url.rstrip("/") + "/socket.io/"
        self._stop.clear()
        self._connect_error = None  # a reused client must not see a stale refusal
        # 1. Engine.IO open handshake
        body = self._http("GET", self._qs())
        pkts = _split_packets(body)
        if not pkts or not pkts[0].startswith("0"):
            raise ConnectionError(f"engine.io handshake failed: {body!r}")
        self._sid = json.loads(pkts[0][1:])["sid"]
        # 2. Socket.IO CONNECT for the default namespace
        self._post("40")
        # 3. poll until the server acks with 40{...}; any packets that ride
        #    along are dispatched normally
        deadline = time.monotonic() + wait_timeout
        while not self.connected and time.monotonic() < deadline:
            for pkt in _split_packets(self._http("GET", self._qs(self._sid))):
                self._handle_packet(pkt)
            if self._connect_error is not None:
                # server refused the namespace CONNECT (auth etc.) —
                # surface its payload instead of spinning to the timeout
                raise ConnectionError(
                    f"socket.io connect refused: {self._connect_error}"
                )
        if not self.connected:
            raise ConnectionError("socket.io namespace connect not acked")
        self._poller = threading.Thread(target=self._poll_loop, daemon=True)
        self._poller.start()

    def emit(self, event: str, data=None) -> None:
        payload = [event] if data is None else [event, data]
        self._post("42" + json.dumps(payload, separators=(",", ":")))

    def disconnect(self) -> None:
        self._stop.set()
        if self.connected:
            self.connected = False
            try:
                self._post("41")  # socket.io namespace disconnect
                self._post("1")  # engine.io close
            except Exception:
                pass
        if self._poller is not None and self._poller is not threading.current_thread():
            self._poller.join(self._timeout)

    # -- wire ------------------------------------------------------------------

    def _qs(self, sid: str | None = None) -> str:
        q = {"EIO": "4", "transport": "polling"}
        if sid is not None:
            q["sid"] = sid
        return "?" + urllib.parse.urlencode(q)

    def _http(self, method: str, qs: str, data: str | None = None) -> str:
        req = urllib.request.Request(
            self._base + qs,
            data=data.encode() if data is not None else None,
            method=method,
            headers={"Content-Type": "text/plain;charset=UTF-8"},
        )
        with urllib.request.urlopen(req, timeout=self._timeout) as resp:
            return resp.read().decode()

    def _post(self, packet: str) -> None:
        # serialize POSTs: the protocol allows one in-flight POST per session
        with self._post_lock:
            self._http("POST", self._qs(self._sid), packet)

    def _handle_packet(self, pkt: str) -> None:
        if pkt.startswith("2"):  # engine.io ping -> pong
            self._post("3")
        elif pkt.startswith("1"):  # engine.io close
            self._mark_disconnected()
        elif pkt.startswith("40"):  # namespace connect ack
            self.connected = True
            fn = self._handlers.get("connect")
            if fn:
                fn()
        elif pkt.startswith("44"):  # CONNECT_ERROR: server refused the nsp
            self._connect_error = pkt[2:] or "connect_error"
            self._mark_disconnected()
        elif pkt.startswith("41"):  # namespace disconnect
            self._mark_disconnected()
        elif pkt.startswith("42"):  # event
            arr = json.loads(pkt[2:])
            fn = self._handlers.get(arr[0])
            if fn:
                fn(*arr[1:])
        # "6" noop and anything unknown: ignore

    def _mark_disconnected(self) -> None:
        was = self.connected
        self.connected = False
        if was:
            fn = self._handlers.get("disconnect")
            if fn:
                fn()

    def _poll_loop(self) -> None:
        while not self._stop.is_set() and self.connected:
            try:
                body = self._http("GET", self._qs(self._sid))
                for pkt in _split_packets(body):
                    # _handle_packet can itself hit the wire (pong POST);
                    # a failure there is the same session loss as a failed
                    # poll and must not escape the thread
                    self._handle_packet(pkt)
            except (urllib.error.URLError, OSError, ConnectionError):
                self._mark_disconnected()
                return


class _Session:
    __slots__ = ("queue", "sio_connected", "last_seen")

    def __init__(self) -> None:
        self.queue: Queue = Queue()
        self.sio_connected = False
        self.last_seen = time.monotonic()


class PollingSocketIOServer:
    """WSGI app implementing the matching server half (polling only).

    Mirrors the ``socketio.Server`` subset the live test and a self-hosted
    broadcast hub need: ``on(event)`` handler registration (handlers get
    ``(sid, *args)``), ``enter_room(sid, room)``, ``emit(event, data,
    room=None)``. Host it on any threaded WSGI server — long-polling needs
    the client's GET (listen) and POST (emit) served concurrently.
    """

    def __init__(
        self, poll_timeout: float = 2.0, session_timeout: float = 45.0
    ) -> None:
        self._sessions: dict[str, _Session] = {}
        self._rooms: dict[str, set[str]] = defaultdict(set)
        self._handlers: dict[str, object] = {}
        self._lock = threading.Lock()
        self._poll_timeout = poll_timeout
        # a client that dies without sending '41'/'1' never closes its
        # session; reap anything idle past pingInterval+pingTimeout-scale
        # so the hub's memory is bounded (queues grow per emit otherwise)
        self._session_timeout = session_timeout

    # -- app-facing surface ----------------------------------------------------

    def on(self, event: str, handler=None):
        if handler is not None:
            self._handlers[event] = handler
            return handler

        def _decorator(fn):
            self._handlers[event] = fn
            return fn

        return _decorator

    def enter_room(self, sid: str, room: str) -> None:
        with self._lock:
            self._rooms[room].add(sid)

    def emit(self, event: str, data=None, room: str | None = None) -> None:
        self._reap_idle()
        payload = [event] if data is None else [event, data]
        pkt = "42" + json.dumps(payload, separators=(",", ":"))
        with self._lock:
            sids = (
                set(self._rooms.get(room, ()))
                if room is not None
                else set(self._sessions)
            )
            # only sessions that completed the Socket.IO CONNECT ('40')
            # receive events — a handshake-only engine.io session must
            # not see a '42' before its namespace ack
            targets = [
                self._sessions[s]
                for s in sids
                if s in self._sessions and self._sessions[s].sio_connected
            ]
        for sess in targets:
            sess.queue.put(pkt)

    def _reap_idle(self) -> None:
        cutoff = time.monotonic() - self._session_timeout
        with self._lock:
            dead = [
                sid
                for sid, sess in self._sessions.items()
                if sess.last_seen < cutoff
            ]
        for sid in dead:
            self.close_session(sid)

    def close_session(self, sid: str) -> None:
        """Drop a session server-side (test hook for disconnect paths)."""
        with self._lock:
            sess = self._sessions.pop(sid, None)
            for members in self._rooms.values():
                members.discard(sid)
        if sess is not None:
            sess.queue.put("1")

    @property
    def session_ids(self) -> list[str]:
        with self._lock:
            return list(self._sessions)

    # -- WSGI ------------------------------------------------------------------

    def __call__(self, environ, start_response):
        qs = urllib.parse.parse_qs(environ.get("QUERY_STRING", ""))
        sid = qs.get("sid", [None])[0]
        method = environ["REQUEST_METHOD"]
        if qs.get("EIO", [None])[0] != "4" or (
            qs.get("transport", [None])[0] != "polling"
        ):
            return self._respond(start_response, "400 Bad Request", "bad transport")
        if method == "GET" and sid is None:
            return self._respond(start_response, "200 OK", self._open_session())
        if sid is None or sid not in self._sessions:
            # unknown session: the client treats the HTTP error as a
            # disconnect and its listener reconnects (D2)
            return self._respond(start_response, "400 Bad Request", "unknown sid")
        sess = self._sessions.get(sid)
        if sess is not None:  # close_session may race the check above
            sess.last_seen = time.monotonic()
        if method == "GET":
            return self._respond(start_response, "200 OK", self._drain(sid))
        if method == "POST":
            n = int(environ.get("CONTENT_LENGTH") or 0)
            body = environ["wsgi.input"].read(n).decode() if n else ""
            for pkt in _split_packets(body):
                self._receive(sid, pkt)
            return self._respond(start_response, "200 OK", "ok")
        return self._respond(start_response, "405 Method Not Allowed", "no")

    # -- internals ---------------------------------------------------------------

    @staticmethod
    def _respond(start_response, status: str, body: str):
        data = body.encode()
        start_response(
            status,
            [
                ("Content-Type", "text/plain; charset=UTF-8"),
                ("Content-Length", str(len(data))),
            ],
        )
        return [data]

    def _open_session(self) -> str:
        # reap on each handshake too: a hub that accepts connections but
        # rarely emits must still bound its session map
        self._reap_idle()
        sid = uuid.uuid4().hex
        with self._lock:
            self._sessions[sid] = _Session()
        return "0" + json.dumps(
            {
                "sid": sid,
                "upgrades": [],
                "pingInterval": 25000,
                "pingTimeout": 20000,
                "maxPayload": 1_000_000,
            },
            separators=(",", ":"),
        )

    def _drain(self, sid: str) -> str:
        sess = self._sessions.get(sid)
        if sess is None:
            return "1"
        try:
            first = sess.queue.get(timeout=self._poll_timeout)
        except Empty:
            # idle poll: ping keeps the session observably alive and
            # exercises the client's pong path
            return "2"
        out = [first]
        while True:
            try:
                out.append(sess.queue.get_nowait())
            except Empty:
                break
        return SEP.join(out)

    def _receive(self, sid: str, pkt: str) -> None:
        sess = self._sessions.get(sid)
        if sess is None:
            return
        if pkt.startswith("40"):  # socket.io CONNECT -> ack with session id
            sess.sio_connected = True
            sess.queue.put("40" + json.dumps({"sid": sid}))
            fn = self._handlers.get("connect")
            if fn:
                fn(sid)
        elif pkt.startswith("42"):
            arr = json.loads(pkt[2:])
            fn = self._handlers.get(arr[0])
            if fn:
                fn(sid, *arr[1:])
        elif pkt.startswith("41") or pkt == "1":
            self.close_session(sid)
        # "3" pong: ignored (no ping-timeout enforcement server-side)
