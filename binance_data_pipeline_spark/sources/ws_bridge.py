"""Dependency-free WebSocket→sink bridge: the live market-data ingress
leg (SURVEY §2.1 S1), as a minimal RFC 6455 client over stdlib sockets —
no `websocket-client`, no `confluent_kafka` import required to run it.

The reference runs `WebSocketApp(...).run_forever(ping_interval=20,
ping_timeout=10)` with a combined-stream subscribe on open and forwards
each trade event to Kafka keyed by symbol
(`producer/binance_ws_to_kafka.py:44-57` subscribe-on-open,
`:58-84` message→record mapping, `:100-110` URL build + keepalive).
This module reproduces those semantics engine-side:

  - `run_bridge(url, sink, ...)` — connect (ws:// or wss://), optionally
    send a subscribe payload on open, forward every text/binary message
    to the pluggable ``sink`` callable, answer server pings with pongs,
    send client pings every ``ping_interval`` seconds of silence and
    treat ``ping_timeout`` without ANY traffic after one as a dead
    connection (RuntimeError — callers wrap with jobs.run_with_retries
    for the reference's reconnect-after-1 s posture).
  - `trade_record(message)` — the reference's message→record projection
    (combined-stream envelope, trade events only, ingest_time stamped),
    so `sink(key, value)` receives exactly the keyed JSON the Kafka
    topic carries (`sources/json_envelope.py` decodes it downstream).

The sink is the integration point: production wires a Kafka producer
callback; tests wire a list. Either way the SOCKET leg is real — the
frame codec and handshake below implement RFC 6455 §4-5 directly
(client-masked frames, 7/16/64-bit lengths, continuation fragments,
ping/pong/close control frames) and are exercised against a stdlib
loopback server in tests/test_ws_bridge.py, so unlike round ≤4 the
ingress path no longer depends on any process the repo doesn't ship.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import ssl
import struct
import time
from collections.abc import Callable
from urllib.parse import urlsplit

__all__ = [
    "encode_frame",
    "read_frame",
    "ws_connect",
    "run_bridge",
    "trade_record",
    "binance_stream_url",
    "subscribe_payload",
]

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

#: opcodes (RFC 6455 §5.2)
OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10


def accept_for_key(key: str) -> str:
    """Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2)."""
    digest = hashlib.sha1((key + _GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_frame(opcode: int, payload: bytes, mask: bool = True, fin: bool = True) -> bytes:
    """One frame (FIN set unless fragmenting). Client→server frames MUST
    be masked (RFC 6455 §5.3); server frames must not be."""
    head = bytearray([(0x80 if fin else 0) | (opcode & 0x0F)])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head.append(mask_bit | n)
    elif n < (1 << 16):
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if not mask:
        return bytes(head) + payload
    key = os.urandom(4)
    head += key
    head += bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(head)


def read_frame(rfile) -> tuple[int, bool, bytes]:
    """Read one frame from a socket file: (opcode, fin, payload).
    Handles 7/16/64-bit lengths and unmasks when the mask bit is set."""
    b0 = rfile.read(1)
    if not b0:
        raise ConnectionError("websocket closed mid-stream")
    b1 = rfile.read(1)
    if not b1:
        raise ConnectionError("websocket closed mid-stream")
    fin = bool(b0[0] & 0x80)
    opcode = b0[0] & 0x0F
    masked = bool(b1[0] & 0x80)
    n = b1[0] & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", rfile.read(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", rfile.read(8))
    key = rfile.read(4) if masked else b""
    payload = rfile.read(n)
    if len(payload) != n:
        raise ConnectionError("websocket frame truncated")
    if masked:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, fin, payload


class _SockReader:
    """Minimal buffered reader over raw recv that SURVIVES socket
    timeouts: a socket.makefile object raises 'cannot read from timed
    out object' forever after one timeout, which would kill the
    keepalive loop — here a timeout leaves the partial buffer intact
    and the next read resumes cleanly."""

    def __init__(self, sock: socket.socket) -> None:
        self._sock = sock
        self._buf = b""

    def read(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)  # may raise socket.timeout
            if not chunk:
                raise ConnectionError("websocket closed mid-stream")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out


def ws_connect(url: str, timeout: float = 10.0) -> socket.socket:
    """Open + handshake an RFC 6455 client connection; returns the
    connected socket (TLS-wrapped for wss://). Raises ConnectionError on
    a bad status line or Sec-WebSocket-Accept mismatch."""
    parts = urlsplit(url)
    if parts.scheme not in ("ws", "wss"):
        raise ValueError(f"not a websocket url: {url}")
    host = parts.hostname or ""
    port = parts.port or (443 if parts.scheme == "wss" else 80)
    path = (parts.path or "/") + (f"?{parts.query}" if parts.query else "")

    sock = socket.create_connection((host, port), timeout=timeout)
    if parts.scheme == "wss":
        sock = ssl.create_default_context().wrap_socket(sock, server_hostname=host)
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall(
        (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    # read response headers UNBUFFERED: a buffered makefile could read
    # ahead and swallow the first frames the server sends after 101
    header = bytearray()
    while not header.endswith(b"\r\n\r\n"):
        b = sock.recv(1)
        if not b:
            sock.close()
            raise ConnectionError("websocket handshake: connection closed")
        header += b
        if len(header) > 65536:
            sock.close()
            raise ConnectionError("websocket handshake: oversized response")
    lines = header.decode("latin-1").split("\r\n")
    if " 101 " not in lines[0]:
        sock.close()
        raise ConnectionError(f"websocket handshake refused: {lines[0].strip()}")
    accept = None
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "sec-websocket-accept":
            accept = v.strip()
    if accept != accept_for_key(key):
        sock.close()
        raise ConnectionError("websocket handshake: bad Sec-WebSocket-Accept")
    return sock


def binance_stream_url(symbols: list[str], base: str = "wss://stream.binance.com:9443/stream") -> str:
    """Combined-stream URL, reference shape
    (`producer/binance_ws_to_kafka.py:95-97`)."""
    streams = "/".join(f"{s}@trade" for s in symbols)
    return f"{base}?streams={streams}"


def subscribe_payload(symbols: list[str]) -> str:
    """Subscribe-on-open JSON, reference shape
    (`producer/binance_ws_to_kafka.py:45-52`)."""
    return json.dumps(
        {"method": "SUBSCRIBE", "params": [f"{s}@trade" for s in symbols], "id": 1}
    )


def trade_record(message: str | bytes, now_ms: int | None = None):
    """The reference's message→(key, record) projection
    (`producer/binance_ws_to_kafka.py:58-84`): combined-stream envelope
    required, non-trade events dropped (returns None), key = lowercase
    symbol, ingest_time stamped."""
    try:
        data = json.loads(message)
    except (ValueError, TypeError):
        return None
    if not isinstance(data, dict) or "stream" not in data or "data" not in data:
        return None
    payload = data["data"]
    if not isinstance(payload, dict) or payload.get("e") != "trade":
        return None
    key = (payload.get("s") or "unknown").lower()
    record = {
        "stream": data["stream"],
        "event_type": payload.get("e"),
        "event_time": payload.get("E"),
        "symbol": payload.get("s"),
        "trade_id": payload.get("t"),
        "price": payload.get("p"),
        "quantity": payload.get("q"),
        "buyer_order_id": payload.get("b"),
        "seller_order_id": payload.get("a"),
        "trade_time": payload.get("T"),
        "is_buyer_maker": payload.get("m"),
        "ignore": payload.get("M"),
        "ingest_time": int(time.time() * 1000) if now_ms is None else now_ms,
    }
    return key, record


def run_bridge(
    url: str,
    sink: Callable[[str, dict], None],
    symbols: list[str] | None = None,
    subscribe: str | None = None,
    ping_interval: float = 20.0,
    ping_timeout: float = 10.0,
    max_messages: int | None = None,
    raw_sink: Callable[[bytes], None] | None = None,
) -> int:
    """Consume one websocket connection until close/death; returns the
    number of messages forwarded.

    Each text/binary message runs through ``trade_record`` and lands in
    ``sink(key, record)`` (non-trade messages are dropped, the reference
    behavior); ``raw_sink`` additionally receives every raw payload when
    given (for bronze-style archival). Keepalive mirrors the reference's
    run_forever(ping_interval=20, ping_timeout=10): after
    ``ping_interval`` seconds of silence a client ping goes out, and
    ``ping_timeout`` more seconds of silence raises RuntimeError — wrap
    with jobs.run_with_retries to reproduce the reconnect loop.
    ``max_messages`` bounds the run for tests/backfills; None streams
    until the server closes."""
    sock = ws_connect(url)
    n_forwarded = 0
    try:
        sock.settimeout(ping_interval)
        if subscribe is None and symbols:
            subscribe = subscribe_payload(symbols)
        if subscribe:
            sock.sendall(encode_frame(OP_TEXT, subscribe.encode()))
        rfile = _SockReader(sock)
        fragments: list[bytes] = []
        frag_op = OP_TEXT
        awaiting_pong_since: float | None = None
        while max_messages is None or n_forwarded < max_messages:
            try:
                opcode, fin, payload = read_frame(rfile)
            except socket.timeout:
                now = time.monotonic()
                if awaiting_pong_since is None:
                    sock.sendall(encode_frame(OP_PING, b"keepalive"))
                    awaiting_pong_since = now
                    sock.settimeout(ping_timeout)
                    continue
                raise RuntimeError(
                    f"websocket dead: no traffic for {ping_timeout}s after ping"
                )
            # any inbound traffic proves liveness
            awaiting_pong_since = None
            sock.settimeout(ping_interval)
            if opcode == OP_PING:
                sock.sendall(encode_frame(OP_PONG, payload))
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                try:  # echo close per RFC 6455 §5.5.1
                    sock.sendall(encode_frame(OP_CLOSE, payload[:2]))
                except OSError:
                    pass
                break
            if opcode in (OP_TEXT, OP_BINARY):
                if not fin:
                    fragments, frag_op = [payload], opcode
                    continue
                message = payload
            elif opcode == OP_CONT:
                fragments.append(payload)
                if not fin:
                    continue
                message = b"".join(fragments)
                fragments = []
            else:
                continue  # unknown opcode: skip
            if raw_sink is not None:
                raw_sink(message)
            rec = trade_record(message)
            if rec is not None:
                sink(rec[0], rec[1])
                n_forwarded += 1
    finally:
        sock.close()
    return n_forwarded


def _main(argv: list[str] | None = None) -> int:
    """CLI twin of the reference producer process
    (`python producer/binance_ws_to_kafka.py`): stream trades into a
    JSONL file the engine's file source ingests directly
    (`streaming/ingest` + `json_envelope.parse_flat_record` read exactly
    these lines). `--reconnect-delay` reproduces the reference's
    sleep-1s-and-retry posture on error/close."""
    import argparse

    ap = argparse.ArgumentParser(description="WebSocket → JSONL trade bridge")
    ap.add_argument("--symbols", nargs="+", default=["btcusdt", "ethusdt", "bnbusdt"])
    ap.add_argument("--url", default=None, help="override the combined-stream URL")
    ap.add_argument("--out", required=True, help="append-mode JSONL sink path")
    ap.add_argument("--max-messages", type=int, default=None)
    ap.add_argument("--ping-interval", type=float, default=20.0)
    ap.add_argument("--ping-timeout", type=float, default=10.0)
    ap.add_argument("--reconnect-delay", type=float, default=1.0)
    ap.add_argument("--once", action="store_true", help="one connection, no reconnect")
    args = ap.parse_args(argv)
    url = args.url or binance_stream_url(args.symbols)

    total = 0
    with open(args.out, "a", buffering=1) as f:

        def sink(key: str, rec: dict) -> None:
            f.write(json.dumps(rec, separators=(",", ":")) + "\n")

        while True:
            try:
                total += run_bridge(
                    url,
                    sink,
                    symbols=args.symbols,
                    ping_interval=args.ping_interval,
                    ping_timeout=args.ping_timeout,
                    max_messages=(
                        None if args.max_messages is None else args.max_messages - total
                    ),
                )
            except (ConnectionError, OSError, RuntimeError):
                if args.once:
                    raise
                time.sleep(args.reconnect_delay)
                continue
            if args.once or (args.max_messages is not None and total >= args.max_messages):
                break
            time.sleep(args.reconnect_delay)  # server closed: reconnect
    return total


if __name__ == "__main__":  # pragma: no cover - exercised via _main in tests
    print(_main())
