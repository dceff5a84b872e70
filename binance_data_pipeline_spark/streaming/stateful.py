"""Custom stateful streaming operator: per-symbol running VWAP + trade
count maintained across micro-batches with applyInPandasWithState.

This is the engine's demonstration of arbitrary stateful processing — the
escape hatch for semantics windowed aggregations can't express (running
cumulative state emitted per batch, cross-batch counters, custom eviction).
The reference has no stateful operators at all (SURVEY §2.8 ST6); its
closest structure is the micro-batch buffer dict in
producer/kafka_to_s3_bronze.py:77-107, which this replaces with managed,
checkpointed state.

State shape: (total_notional double, total_qty double, n_trades long) per
symbol — constant size per key, so state store growth is bounded by symbol
cardinality regardless of throughput. Output: one row per (symbol, batch)
with the running values after that batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("total_notional", DoubleType()),
        StructField("total_qty", DoubleType()),
        StructField("n_trades", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("running_vwap", DoubleType()),
        StructField("running_notional", DoubleType()),
        StructField("n_trades", LongType()),
    ]
)


def _update_vwap(
    key: tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (symbol,) = key
    if state.exists:
        total_notional, total_qty, n_trades = state.get
    else:
        total_notional, total_qty, n_trades = 0.0, 0.0, 0
    for pdf in batches:
        notional = (pdf["price"] * pdf["quantity"]).sum()
        total_notional += float(notional)
        total_qty += float(pdf["quantity"].sum())
        n_trades += int(len(pdf))
    state.update((total_notional, total_qty, n_trades))
    yield pd.DataFrame(
        {
            "symbol": [symbol],
            "running_vwap": [total_notional / total_qty if total_qty else None],
            "running_notional": [total_notional],
            "n_trades": [n_trades],
        }
    )


def running_vwap(staged: DataFrame) -> DataFrame:
    """Streaming running VWAP per symbol (staged trades: symbol, price,
    quantity doubles). Emits the post-batch running values each trigger."""
    return (
        staged.select("symbol", "price", "quantity")
        .groupBy("symbol")
        .applyInPandasWithState(
            _update_vwap,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------
# Timeout-evicting session tracker: event-time timeouts + state removal
# ---------------------------------------------------------------------

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_ms", LongType()),
        StructField("last_ms", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def session_tracker(events: DataFrame, gap_ms: int = 30_000, watermark: str = "10 seconds") -> DataFrame:
    """Closed-session records via EVENT-TIME TIMEOUTS — the stateful
    capability ``F.session_window`` cannot express: a session is emitted
    exactly once, WHEN it closes (watermark passes last_event + gap), and
    its state is REMOVED (bounded store: open sessions only, not history).
    ``running_vwap`` above shows cross-batch accumulation; this shows the
    other half of arbitrary stateful processing — timeout wake-ups firing
    with NO new rows for the key, followed by eviction.

    Input: (user_id long, ts timestamp, value double). Output: one row per
    CLOSED session. In-flight sessions emit nothing until they close; a
    stream restart resumes them from checkpointed state.

    Mechanics: per key, fold each batch into (n, total, first, last); set
    the group's timeout timestamp to last_event + gap (must stay above the
    current watermark, clamped); when the watermark crosses it Spark
    invokes the function with ``state.hasTimedOut`` and an empty batch
    iterator — emit and ``state.remove()``. Timeouts are evaluated per
    trigger, so a closed session surfaces on the batch AFTER the watermark
    passes it (standard Structured Streaming semantics)."""

    def track(
        key: tuple[int], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, first, last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "session_start_ms": [first],
                    "session_end_ms": [last],
                    "duration_ms": [last - first],
                }
            )
            return
        if state.exists:
            n, total, first, last = state.get
        else:
            n, total, first, last = 0, 0.0, None, None
        for pdf in batches:
            if pdf.empty:
                continue
            ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            n += int(len(pdf))
            total += float(pdf["value"].sum())
            first = int(ms.min()) if first is None else min(first, int(ms.min()))
            last = int(ms.max()) if last is None else max(last, int(ms.max()))
        if last is None:
            return
        state.update((n, total, first, last))
        # timeout must sit above the current watermark or Spark rejects it
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))
        return

    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
