"""Cross-process / cross-host topic transport: a TCP bridge between Buses.

The reference's DDS backbone is inherently cross-process (C++ detector node
<-> Python flow nodes); our in-process :class:`~.bus.Bus` gains that through
a length-prefixed-pickle TCP bridge:

- :class:`BusBridgeServer` — accepts connections and re-publishes every
  message received onto the local bus; forwards selected local topics to all
  connected peers.
- :class:`BusBridgeClient` — connects out, same forwarding semantics.

This is the DCN leg of the SURVEY §2.3 mapping (host pub/sub over DCN feeds
per-device pipelines; on-device scale-out is the separate ICI path in
``parallel/``).  Wire format: 4-byte big-endian length + pickle of
(topic, msg).  Loop protection: bridged messages are tagged and not
re-forwarded.
"""
from __future__ import annotations

import pickle
import socket
import struct
import threading

from .bus import Bus

_HDR = struct.Struct(">I")


def _send_msg(sock: socket.socket, topic: str, msg) -> None:
    payload = pickle.dumps((topic, msg), protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_HDR.pack(len(payload)) + payload)


def _recv_msg(sock: socket.socket):
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            return None
        hdr += chunk
    (n,) = _HDR.unpack(hdr)
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            return None
        buf += chunk
    return pickle.loads(buf)


class _BridgeBase:
    def __init__(self, bus: Bus, forward_topics: list[str]):
        self.bus = bus
        self.forward_topics = forward_topics
        self._peers: list[socket.socket] = []
        self._peers_lock = threading.Lock()
        self._stop = threading.Event()
        self._from_remote = threading.local()
        for t in forward_topics:
            self.bus.subscribe(t, self._make_forwarder(t))

    def _make_forwarder(self, topic: str):
        def forward(msg):
            if getattr(self._from_remote, "active", False):
                return  # came from a peer: don't echo back
            with self._peers_lock:
                peers = list(self._peers)
            for p in peers:
                try:
                    _send_msg(p, topic, msg)
                except OSError:
                    with self._peers_lock:
                        if p in self._peers:
                            self._peers.remove(p)

        return forward

    def _pump(self, sock: socket.socket):
        while not self._stop.is_set():
            try:
                item = _recv_msg(sock)
            except OSError:
                break
            if item is None:
                break
            topic, msg = item
            self._from_remote.active = True
            try:
                self.bus.publish(topic, msg)
            finally:
                self._from_remote.active = False
        with self._peers_lock:
            if sock in self._peers:
                self._peers.remove(sock)
        sock.close()

    def close(self):
        self._stop.set()
        with self._peers_lock:
            for p in self._peers:
                try:
                    p.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                p.close()
            self._peers.clear()


class BusBridgeServer(_BridgeBase):
    def __init__(self, bus: Bus, port: int = 0, host: str = "127.0.0.1",
                 forward_topics: list[str] | None = None):
        super().__init__(bus, forward_topics or [])
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen()
        self.port = self._srv.getsockname()[1]
        self._accept_thread = threading.Thread(target=self._accept, daemon=True)
        self._accept_thread.start()

    def _accept(self):
        while not self._stop.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return
            sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            with self._peers_lock:
                self._peers.append(sock)
            threading.Thread(target=self._pump, args=(sock,), daemon=True).start()

    def close(self):
        super().close()
        try:
            self._srv.close()
        except OSError:
            pass


class BusBridgeClient(_BridgeBase):
    def __init__(self, bus: Bus, host: str, port: int,
                 forward_topics: list[str] | None = None):
        super().__init__(bus, forward_topics or [])
        sock = socket.create_connection((host, port), timeout=10)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        with self._peers_lock:
            self._peers.append(sock)
        threading.Thread(target=self._pump, args=(sock,), daemon=True).start()
