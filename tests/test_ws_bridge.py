"""Live-socket WebSocket ingress (sources/ws_bridge.py): RFC 6455 frame
codec, handshake, keepalive, and the reference's message→record
projection — exercised against a REAL stdlib loopback server, so the
ingress leg no longer depends on any process the repo doesn't ship
(reference semantics: producer/binance_ws_to_kafka.py)."""

from __future__ import annotations

import io
import json
import socket
import sys
import threading

sys.path.insert(0, "/root/repo")

import pytest

from binance_data_pipeline_spark.sources.ws_bridge import (
    OP_CLOSE,
    OP_CONT,
    OP_PING,
    OP_PONG,
    OP_TEXT,
    accept_for_key,
    binance_stream_url,
    encode_frame,
    read_frame,
    run_bridge,
    subscribe_payload,
    trade_record,
)


# ------------------------------------------------------------- unit layer

def test_accept_for_key_rfc_vector():
    # the worked example from RFC 6455 §1.3
    assert accept_for_key("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


@pytest.mark.parametrize("n", [5, 300, 70_000])  # 7-, 16-, 64-bit lengths
@pytest.mark.parametrize("mask", [True, False])
def test_frame_roundtrip_all_length_classes(n, mask):
    payload = bytes(i % 251 for i in range(n))
    raw = encode_frame(OP_TEXT, payload, mask=mask)
    assert bool(raw[1] & 0x80) is mask  # mask bit on the wire
    opcode, fin, got = read_frame(io.BytesIO(raw))
    assert (opcode, fin, got) == (OP_TEXT, True, payload)


def test_fin_bit_controls_fragmentation():
    raw = encode_frame(OP_TEXT, b"part", fin=False)
    _, fin, _ = read_frame(io.BytesIO(raw))
    assert fin is False


def test_trade_record_projection():
    """The reference mapping (binance_ws_to_kafka.py:58-84): combined
    envelope required, non-trade dropped, key = lowercase symbol."""
    msg = json.dumps(
        {
            "stream": "btcusdt@trade",
            "data": {
                "e": "trade", "E": 1, "s": "BTCUSDT", "t": 7, "p": "100.5",
                "q": "0.1", "b": 1, "a": 2, "T": 2, "m": True, "M": True,
            },
        }
    )
    key, rec = trade_record(msg, now_ms=123)
    assert key == "btcusdt"
    assert rec["trade_id"] == 7 and rec["price"] == "100.5"
    assert rec["ingest_time"] == 123 and rec["event_type"] == "trade"

    assert trade_record("not json") is None
    assert trade_record(json.dumps({"no": "envelope"})) is None
    assert trade_record(
        json.dumps({"stream": "s", "data": {"e": "depthUpdate"}})
    ) is None


def test_url_and_subscribe_shapes():
    url = binance_stream_url(["btcusdt", "ethusdt"])
    assert url.endswith("/stream?streams=btcusdt@trade/ethusdt@trade")
    sub = json.loads(subscribe_payload(["btcusdt"]))
    assert sub == {"method": "SUBSCRIBE", "params": ["btcusdt@trade"], "id": 1}


# ------------------------------------------------------- live-socket layer

def _handshake_server_side(conn) -> io.BufferedReader:
    rfile = conn.makefile("rb")
    key = None
    assert rfile.readline().startswith(b"GET ")
    while True:
        line = rfile.readline().decode("latin-1").strip()
        if not line:
            break
        k, _, v = line.partition(":")
        if k.strip().lower() == "sec-websocket-key":
            key = v.strip()
    conn.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept_for_key(key)}\r\n\r\n"
        ).encode()
    )
    return rfile


def _trade_msg(sym: str, tid: int) -> bytes:
    return json.dumps(
        {
            "stream": f"{sym.lower()}@trade",
            "data": {"e": "trade", "E": 1, "s": sym, "t": tid, "p": "1",
                     "q": "2", "b": 1, "a": 2, "T": 3, "m": False, "M": True},
        }
    ).encode()


def test_bridge_end_to_end_over_loopback():
    """A real socket leg: handshake, subscribe-on-open, trade forwarding,
    non-trade drop, fragmented frames, server ping → client pong, clean
    close — server side asserts what it receives from the client."""
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    server_seen: dict = {}

    def serve():
        conn, _ = server.accept()
        rf = _handshake_server_side(conn)
        op, _, sub = read_frame(rf)  # client subscribe (masked; codec unmasks)
        server_seen["subscribe"] = (op, json.loads(sub))
        conn.sendall(encode_frame(OP_TEXT, _trade_msg("BTCUSDT", 1), mask=False))
        conn.sendall(  # non-trade: must be dropped by the projection
            encode_frame(OP_TEXT, b'{"stream":"x","data":{"e":"depth"}}', mask=False)
        )
        whole = _trade_msg("ETHUSDT", 2)
        conn.sendall(encode_frame(OP_TEXT, whole[:10], mask=False, fin=False))
        conn.sendall(encode_frame(OP_CONT, whole[10:], mask=False))
        conn.sendall(encode_frame(OP_PING, b"hb", mask=False))
        op, _, pong = read_frame(rf)
        server_seen["pong"] = (op, pong)
        conn.sendall(encode_frame(OP_TEXT, _trade_msg("BNBUSDT", 3), mask=False))
        conn.sendall(encode_frame(OP_CLOSE, b"\x03\xe8", mask=False))
        op, _, _ = read_frame(rf)  # close echo
        server_seen["close_echo"] = op
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    got: list[tuple[str, dict]] = []
    raw: list[bytes] = []
    n = run_bridge(
        f"ws://127.0.0.1:{port}/stream?streams=btcusdt@trade",
        sink=lambda k, v: got.append((k, v)),
        symbols=["btcusdt"],
        ping_interval=5.0,
        ping_timeout=2.0,
        raw_sink=raw.append,
    )
    t.join(10)
    server.close()

    assert n == 3 and [k for k, _ in got] == ["btcusdt", "ethusdt", "bnbusdt"]
    assert got[1][1]["trade_id"] == 2  # fragmented message reassembled
    assert len(raw) == 4  # raw archival sees the dropped non-trade too
    assert server_seen["subscribe"][0] == OP_TEXT
    assert server_seen["subscribe"][1]["method"] == "SUBSCRIBE"
    assert server_seen["pong"] == (OP_PONG, b"hb")  # keepalive answered
    assert server_seen["close_echo"] == OP_CLOSE


def test_bridge_keepalive_declares_dead_connection():
    """A silent server draws a client ping after ping_interval; silence
    through ping_timeout raises — the run_forever(20, 10) semantics."""
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    server_seen: dict = {}

    def serve():
        conn, _ = server.accept()
        rf = _handshake_server_side(conn)
        op, _, payload = read_frame(rf)  # the keepalive ping
        server_seen["ping"] = (op, payload)
        # ... and never answer
        t0 = conn  # keep the socket open until the client gives up
        import time as _t

        _t.sleep(2)
        t0.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    with pytest.raises(RuntimeError, match="no traffic"):
        run_bridge(
            f"ws://127.0.0.1:{port}/",
            sink=lambda k, v: None,
            ping_interval=0.3,
            ping_timeout=0.3,
        )
    t.join(10)
    server.close()
    assert server_seen["ping"] == (OP_PING, b"keepalive")


def test_handshake_rejects_bad_accept():
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        conn.makefile("rb").readline()
        conn.sendall(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Accept: bogus\r\n\r\n"
        )

    threading.Thread(target=serve, daemon=True).start()
    from binance_data_pipeline_spark.sources.ws_bridge import ws_connect

    with pytest.raises(ConnectionError, match="Accept"):
        ws_connect(f"ws://127.0.0.1:{port}/")
    server.close()


def test_bridge_output_is_engine_wire_format(spark):
    """The full S1→S2→P3 contract chain with zero external processes:
    messages from the live loopback bridge, serialized the reference way
    (compact JSON, binance_ws_to_kafka.py:37), parse back through the
    engine's bronze-consumer decode (parse_flat_record) with every field
    typed — the shipped bridge emits exactly the wire format the engine
    ingests."""
    import json as _json

    from binance_data_pipeline_spark.sources.json_envelope import parse_flat_record

    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        rf = _handshake_server_side(conn)
        read_frame(rf)  # subscribe
        conn.sendall(encode_frame(OP_TEXT, _trade_msg("BTCUSDT", 11), mask=False))
        conn.sendall(encode_frame(OP_TEXT, _trade_msg("ETHUSDT", 12), mask=False))
        conn.sendall(encode_frame(OP_CLOSE, b"\x03\xe8", mask=False))
        read_frame(rf)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    wire: list[tuple[str, str]] = []
    run_bridge(
        f"ws://127.0.0.1:{port}/",
        sink=lambda k, v: wire.append((k, _json.dumps(v, separators=(",", ":")))),
        symbols=["btcusdt"],
    )
    t.join(10)
    server.close()

    raw = spark.createDataFrame(wire, "key string, value string")
    rows = {r["trade_id"]: r for r in parse_flat_record(raw).collect()}
    assert set(rows) == {11, 12}
    r = rows[11]
    assert r["symbol"] == "BTCUSDT" and r["price"] == "1"
    assert r["is_buyer_maker"] is False and r["ingest_time"] is not None
    assert isinstance(r["event_time"], int) and isinstance(r["trade_time"], int)


def test_cli_writes_engine_readable_jsonl(tmp_path):
    """The __main__ entry: one connection (--once), trades appended as
    compact JSONL — the file the engine's file-source ingest reads."""
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        rf = _handshake_server_side(conn)
        read_frame(rf)  # subscribe
        conn.sendall(encode_frame(OP_TEXT, _trade_msg("BTCUSDT", 21), mask=False))
        conn.sendall(encode_frame(OP_TEXT, _trade_msg("ETHUSDT", 22), mask=False))
        conn.sendall(encode_frame(OP_CLOSE, b"\x03\xe8", mask=False))
        read_frame(rf)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    out = tmp_path / "trades.jsonl"
    from binance_data_pipeline_spark.sources.ws_bridge import _main

    n = _main(
        ["--url", f"ws://127.0.0.1:{port}/", "--symbols", "btcusdt",
         "--out", str(out), "--once"]
    )
    t.join(10)
    server.close()

    lines = [json.loads(line) for line in out.read_text().splitlines()]
    assert n == 2 and [r["trade_id"] for r in lines] == [21, 22]
    assert all(r["event_type"] == "trade" and "ingest_time" in r for r in lines)
