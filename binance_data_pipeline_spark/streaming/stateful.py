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
