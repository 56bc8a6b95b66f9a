"""Broadcast-triggered incremental sync (SURVEY D1-D4).

The reference subscribes a socket.io client to a broadcast channel and runs
the configured sync on every ``update`` event, with a 5 s reconnect loop and
a 5 s failed-trigger retry loop (``src/lib/client.js:1981-2047``).

Spark-side this is driver orchestration, not data-plane work: the listener
consumes events from an injectable source (a socket client, a queue, a Kafka
consumer — anything iterable), coalesces bursts, and triggers the engine's
delta sync. The engine's single-flight mutex (D4) already rejects overlap;
the listener treats a rejection as "a sync is in flight" and re-queues.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field

RETRY_INTERVAL_S = 5.0  # reference: client.js:1997, :2039


@dataclass
class BroadcastListener:
    """Runs ``sync_fn()`` once per received event, serialized, with retry.

    ``connect`` returns an event iterator (blocking); raising from it models a
    disconnect → the listener reconnects after ``retry_interval`` (D2). A
    failed sync retries every ``retry_interval`` until success (D3).
    """

    connect: Callable[[], object]  # () -> iterator of events
    sync_fn: Callable[[], object]  # () -> SyncResult
    retry_interval: float = RETRY_INTERVAL_S
    max_sync_retries: int = 60
    _stop: threading.Event = field(default_factory=threading.Event, repr=False)
    _pending: threading.Event = field(default_factory=threading.Event, repr=False)
    _thread: threading.Thread | None = field(default=None, repr=False)
    _worker: threading.Thread | None = field(default=None, repr=False)
    events_seen: int = 0
    syncs_run: int = 0
    errors: int = 0

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> "BroadcastListener":
        self._thread = threading.Thread(target=self._listen_loop, daemon=True)
        self._worker = threading.Thread(target=self._sync_loop, daemon=True)
        self._thread.start()
        self._worker.start()
        return self

    def stop(self, timeout: float = 30.0) -> None:
        self._stop.set()
        self._pending.set()  # wake the worker
        for t in (self._thread, self._worker):
            if t is not None:
                t.join(timeout)

    # -- loops -----------------------------------------------------------------

    def _connect_source(self):
        """Call the connect factory, passing our stop event when it accepts
        one (``socketio_connect`` does) so a blocking source can observe
        ``stop()`` and end its iterator instead of stalling the join."""
        import inspect  # noqa: PLC0415

        try:
            # explicit parameter only — a **kwargs factory may forward its
            # kwargs to a constructor that rejects unknown keys, and a
            # surprise stop_event= would break every connect attempt
            accepts = "stop_event" in inspect.signature(self.connect).parameters
        except (TypeError, ValueError):
            accepts = False
        return self.connect(stop_event=self._stop) if accepts else self.connect()

    def _listen_loop(self) -> None:
        """D1+D2: consume events; on source failure, reconnect after a pause."""
        while not self._stop.is_set():
            try:
                for _event in self._connect_source():
                    self.events_seen += 1
                    self._pending.set()  # coalesce bursts into one pending flag
                    if self._stop.is_set():
                        return
                return  # source exhausted cleanly
            except Exception:
                self.errors += 1
                if self._stop.wait(self.retry_interval):
                    return

    def _sync_loop(self) -> None:
        """D3: one sync per pending flag; failed sync retries until success."""
        while not self._stop.is_set():
            if not self._pending.wait(timeout=0.1):
                continue
            self._pending.clear()
            for _attempt in range(self.max_sync_retries):
                if self._stop.is_set():
                    return
                try:
                    result = self.sync_fn()
                    if getattr(result, "synctype", None) == "REJECTED":
                        # another sync in flight: try again shortly (D4)
                        time.sleep(0.05)
                        continue
                    self.syncs_run += 1
                    break
                except Exception:
                    self.errors += 1
                    if self._stop.wait(self.retry_interval):
                        return


def socketio_connect(
    broadcast_url: str,
    path: str,
    client_factory: Callable[[], object] | None = None,
    event: str = "update",
    poll_interval: float = 0.5,
) -> Callable[[], object]:
    """D1 transport parity: a ``connect`` factory for
    :class:`BroadcastListener` that subscribes a socket.io client to the SRI
    broadcast channel and joins the room named by the resource path — the
    reference's exact protocol (``client.js:1988-2004``: connect to
    ``broadcastUrl``, on connect ``emit('join', path.split('?')[0])``,
    trigger a sync per ``update`` event).

    ``python-socketio`` is an OPTIONAL dependency: the import is deferred to
    connect time, and when the package is absent the in-repo long-polling
    transport (:class:`..streaming.sio_polling.PollingSocketIOClient`, the
    same public Engine.IO v4 / Socket.IO v5 wire protocol over stdlib
    HTTP) is used instead — the broadcast path runs live either way.
    ``client_factory`` injects any object with the socket.io client surface
    (``on``/``connect``/``connected``/``disconnect``) — the test seam, and
    an escape hatch for other transports.

    The returned iterator yields one item per received event and RAISES on
    disconnect, which is exactly the contract BroadcastListener's reconnect
    loop (D2, ``client.js:1991-1997``) expects: the listener re-calls this
    factory after ``retry_interval``, re-creating the client and re-joining
    the room. The factory accepts a ``stop_event`` (BroadcastListener passes
    its own): when set, the iterator ends cleanly at the next poll tick and
    disconnects the client — without it, ``stop()`` could not terminate a
    healthy blocking listen loop.
    """
    import queue as _queue  # noqa: PLC0415

    def _connect(stop_event=None):
        if client_factory is not None:
            client = client_factory()
        else:
            try:
                import socketio  # noqa: PLC0415

                client = socketio.Client()
            except ImportError:
                # public-protocol fallback: Engine.IO v4 long-polling over
                # stdlib HTTP (sio_polling) — same handshake/join/update
                # wire format, no optional dependency required
                from .sio_polling import PollingSocketIOClient  # noqa: PLC0415

                client = PollingSocketIOClient()
        events: _queue.Queue = _queue.Queue()

        def _on_event(*data):
            events.put(data)

        def _on_connect():
            # the reference strips the query string before joining the room
            client.emit("join", path.split("?")[0])

        client.on(event, _on_event)
        client.on("connect", _on_connect)
        client.connect(broadcast_url)  # raises -> D2 reconnect handles it

        def _iter():
            try:
                while stop_event is None or not stop_event.is_set():
                    try:
                        yield events.get(timeout=poll_interval)
                    except _queue.Empty:
                        if not getattr(client, "connected", True):
                            raise ConnectionError(
                                "socket.io broadcast disconnected"
                            ) from None
            finally:
                try:
                    client.disconnect()
                except Exception:
                    pass

        return _iter()

    return _connect
