"""Streaming analytics the reference lacks (ST5/ST6): watermarked windowed
aggregations over the trade stream.

- ohlcv_bars: tumbling event-time windows per symbol — OHLCV + VWAP.
  first/last by event time via max_by/min_by on (value, ts) — inside one
  watermark-bounded window state, Spark evaluates them deterministically
  against event time.
- dedup_within_watermark: dropDuplicates on trade_id bounded by the
  watermark — the declarative replacement for the reference's brute-force
  3-day re-ingest + high-watermark drop + unique_key merge (ST5,
  ingest_binance_last_3_days.py:105-146 + fact_trades.sql:25-27).
- session_bursts: session_window per symbol — burst detection (gap-based),
  impossible in the reference's architecture.

State sizing at scale: watermark bounds state to (symbols × windows within
the lateness horizon); symbol cardinality is small (thousands), so state
stays tiny even at 100 TB/day throughput.

Late-data note (verified empirically): Spark drops too-late rows
*best-effort* — a row far below the watermark may still be aggregated and
immediately emitted as its own finalized window (it can never merge into an
already-finalized window; append mode emits each window exactly once).
Downstream consumers that need strict exclusion should filter bars against
their own cutoff, exactly as the reference's batch HWM filter does
(fact_trades.sql:25-27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "10 minutes"


def ohlcv_bars(
    staged: DataFrame,
    window_size: str = "1 minute",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "event_time",
) -> DataFrame:
    """Tumbling OHLCV+VWAP bars per symbol from staged trades (price,
    quantity doubles). Works identically on batch DataFrames (no watermark
    applied there) — used by tests to cross-check stream vs batch output."""
    df = staged
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_size).alias("bar"), "symbol")
        .agg(
            F.min_by("price", ts_col).alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", ts_col).alias("close"),
            F.sum("quantity").alias("volume"),
            F.sum(F.col("price") * F.col("quantity")).alias("notional"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .withColumn("vwap", F.col("notional") / F.col("volume"))
        .select(
            F.col("bar.start").alias("bar_start"),
            F.col("bar.end").alias("bar_end"),
            "symbol",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "notional",
            "vwap",
            "n_trades",
        )
    )


def dedup_within_watermark(
    staged: DataFrame,
    key: str = "trade_id",
    watermark: str = "3 days",
    ts_col: str = "event_time",
) -> DataFrame:
    """Streaming exactly-once-per-key within the lateness horizon: the
    watermark bounds the dedup state to 3 days — the same window the
    reference re-ingests daily (binance_revenue_dag.py:34)."""
    df = staged
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.dropDuplicates([key])


def stream_asof_quotes(
    trades: DataFrame,
    quotes: DataFrame,
    max_quote_age: str = "5 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Stream-stream interval join: each trade matched to quotes at most
    `max_quote_age` older, same symbol — the streaming approximation of the
    as-of join (batch exact version: operators/asof.py).

    Both sides carry watermarks so the join state is bounded: Spark retains
    quote rows only within (watermark + interval). Emits one row per
    (trade, qualifying quote); downstream picks the newest via a window or
    max_by per trade for true as-of semantics.

    trades: (symbol, trade_ts, price, quantity); quotes: (symbol, quote_ts,
    bid, ask).
    """
    t = trades.withWatermark("trade_ts", watermark) if trades.isStreaming else trades
    q = quotes.withWatermark("quote_ts", watermark) if quotes.isStreaming else quotes
    return t.alias("t").join(
        q.alias("q"),
        F.expr(
            f"""
            t.symbol = q.symbol AND
            q.quote_ts <= t.trade_ts AND
            q.quote_ts >= t.trade_ts - INTERVAL {max_quote_age}
            """
        ),
    ).select(
        F.col("t.symbol").alias("symbol"),
        F.col("t.trade_ts").alias("trade_ts"),
        F.col("t.price").alias("price"),
        F.col("q.quote_ts").alias("quote_ts"),
        F.col("q.bid").alias("bid"),
        F.col("q.ask").alias("ask"),
    )


def session_bursts(
    staged: DataFrame,
    gap: str = "30 seconds",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "event_time",
) -> DataFrame:
    """Gap-based session windows per symbol: trade bursts with event
    counts and notional. session_window closes a session after `gap` of
    silence (ST6)."""
    df = staged
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("session"), "symbol")
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.sum(F.col("price") * F.col("quantity")).alias("notional"),
        )
        .select(
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "symbol",
            "n_trades",
            "notional",
        )
    )
