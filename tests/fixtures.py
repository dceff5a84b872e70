"""Deterministic synthetic fixtures per FIXTURES.md: raw WS envelope
messages (with malformed/non-trade/missing-field noise), bronze rows,
fee/tax rules, silver slices. Seeded — same data every run."""

from __future__ import annotations

import json
import random
from datetime import datetime, timezone

SYMBOLS = ["BTCUSDT", "ETHUSDT", "BNBUSDT"]
BASE_MS = int(datetime(2024, 6, 10, 9, 0, 0, tzinfo=timezone.utc).timestamp() * 1000)


def raw_ws_messages(n: int = 2000, seed: int = 42) -> list[str]:
    """Envelope JSON strings (FIXTURES.md §1): ~1% malformed JSON, ~2%
    non-trade events, ~1% missing fields; 3 symbols over ~3 hours."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        roll = rng.random()
        sym = SYMBOLS[i % 3]
        t_ms = BASE_MS + int(i * (3 * 3600 * 1000) / n)
        if roll < 0.01:
            out.append('{"stream": "oops", "data": {broken')
            continue
        data = {
            "e": "trade",
            "E": t_ms,
            "s": sym,
            "t": 1_000_000 + i,
            "p": f"{100 + rng.random() * 50:.2f}",
            "q": f"{rng.random():.4f}",
            "b": 10_000 + i,
            "a": 20_000 + i,
            "T": t_ms - 3,
            "m": bool(i & 1),
            "M": True,
        }
        if roll < 0.03:
            data["e"] = "aggTrade"  # non-trade event type (dropped by P2)
        elif roll < 0.04:
            del data["q"]  # missing field → null (P3)
        out.append(json.dumps({"stream": f"{sym.lower()}@trade", "data": data}))
    return out


def expected_trade_count(n: int = 2000, seed: int = 42) -> int:
    rng = random.Random(seed)
    keep = 0
    for _ in range(n):
        roll = rng.random()
        if roll < 0.01:
            continue  # malformed: no further draws
        rng.random()  # price draw
        rng.random()  # qty draw
        if roll < 0.03:
            continue  # non-trade event
        keep += 1
    return keep


def bronze_rows(n: int = 3000, seed: int = 7, dup_rate: float = 0.005,
                late_rows: int = 20, bad_price_rows: int = 10) -> list[dict]:
    """Wire-shaped flat records (pre-bronze): epoch-ms longs, string
    decimals; includes duplicate trade_ids, late stragglers, and
    non-numeric price strings (FIXTURES.md §2)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        t_ms = BASE_MS + int(i * (3 * 24 * 3600 * 1000) / n)  # 3-day span
        rows.append(
            {
                "trade_id": 500_000 + i,
                "symbol": SYMBOLS[i % 3],
                "price": f"{100 + rng.random() * 50:.2f}",
                "quantity": f"{rng.random():.4f}",
                "event_time": t_ms,
                "trade_time": t_ms - 2,
                "buyer_order_id": 1_000 + i,
                "seller_order_id": 2_000 + i,
                "is_buyer_maker": bool(i & 1),
                "ingest_time": t_ms + 500,
            }
        )
    # duplicates (re-ingest dupes): copy some rows verbatim
    for i in range(int(n * dup_rate)):
        rows.append(dict(rows[rng.randrange(n)]))
    # late stragglers: older than everything else
    for i in range(late_rows):
        r = dict(rows[i])
        r["trade_id"] = 400_000 + i
        r["event_time"] = BASE_MS - (i + 1) * 3_600_000
        rows.append(r)
    # unparsable prices (coerce-to-null path)
    for i in range(bad_price_rows):
        r = dict(rows[i + late_rows])
        r["trade_id"] = 300_000 + i
        r["price"] = "n/a"
        rows.append(r)
    return rows


RULES_ROWS = [
    ("BTCUSDT", "US", 7.5, 2.0),
    ("ETHUSDT", "EU", 5.0, 1.0),
    # BNBUSDT deliberately absent → default region "EU", rates 0.0
]
