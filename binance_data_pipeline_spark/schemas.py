"""Canonical schemas for the trade pipeline.

The reference infers schema everywhere (BigQuery ``autodetect``,
``airflow/dags/ingest_binance_last_3_days.py:92-96``); this engine pins
explicit StructTypes so batch and streaming share one contract
(SURVEY.md §1.3). Types mirror the reference's canonical post-clean types:
prices/quantities are DoubleType (the reference computes money in FLOAT64,
``dbt_project/models/staging/stg_binance_trades.sql:11-12``), ids are
strings, times are UTC timestamps derived from epoch millis.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Raw Binance combined-stream payload, as flattened by the reference producer
# (producer/binance_ws_to_kafka.py:59-81). price/quantity are STRINGS on the
# wire — Binance sends decimals as strings.
TRADE_DATA_SCHEMA = StructType(
    [
        StructField("e", StringType()),   # event type ("trade")
        StructField("E", LongType()),     # event time, epoch ms
        StructField("s", StringType()),   # symbol
        StructField("t", LongType()),     # trade id
        StructField("p", StringType()),   # price (string on the wire)
        StructField("q", StringType()),   # quantity (string on the wire)
        StructField("b", LongType()),     # buyer order id
        StructField("a", LongType()),     # seller order id
        StructField("T", LongType()),     # trade time, epoch ms
        StructField("m", BooleanType()),  # is buyer maker
        StructField("M", BooleanType()),  # ignore
    ]
)

# Combined-stream envelope {"stream": "...", "data": {...}} — the only nested
# structure in the reference (producer/binance_ws_to_kafka.py:56-64).
ENVELOPE_SCHEMA = StructType(
    [
        StructField("stream", StringType()),
        StructField("data", TRADE_DATA_SCHEMA),
    ]
)

# Flat record the producer publishes to Kafka
# (producer/binance_ws_to_kafka.py:67-81).
KAFKA_TRADE_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_time", LongType()),
        StructField("symbol", StringType()),
        StructField("trade_id", LongType()),
        StructField("price", StringType()),
        StructField("quantity", StringType()),
        StructField("buyer_order_id", LongType()),
        StructField("seller_order_id", LongType()),
        StructField("trade_time", LongType()),
        StructField("is_buyer_maker", BooleanType()),
        StructField("ignore", BooleanType()),
        StructField("ingest_time", LongType()),
    ]
)

# Bronze table after epoch→timestamp conversion
# (producer/kafka_to_s3_bronze.py:30-54, SURVEY.md §1.1).
BRONZE_TRADE_SCHEMA = StructType(
    [
        StructField("trade_id", StringType()),
        StructField("symbol", StringType()),
        StructField("price", StringType()),
        StructField("quantity", StringType()),
        StructField("event_time", TimestampType()),
        StructField("trade_time", TimestampType()),
        StructField("buyer_order_id", LongType()),
        StructField("seller_order_id", LongType()),
        StructField("is_buyer_maker", BooleanType()),
        StructField("ingest_time", TimestampType()),
        StructField("event_date", DateType()),
        StructField("hour", StringType()),
    ]
)

# Staging view stg_binance_trades
# (dbt_project/models/staging/stg_binance_trades.sql:5-15).
STAGING_TRADE_SCHEMA = StructType(
    [
        StructField("trade_id", StringType()),
        StructField("symbol", StringType()),
        StructField("price", DoubleType()),
        StructField("quantity", DoubleType()),
        StructField("event_time", TimestampType()),
        StructField("event_date", DateType()),
    ]
)

# Fee/tax rules dimension (schema inferred from usage,
# producer/build_fact_fee_tax.py:40-63; the CSV itself is gitignored).
FEE_TAX_RULES_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("region", StringType()),
        StructField("fee_rate_bps", DoubleType()),
        StructField("tax_rate_bps", DoubleType()),
    ]
)

# Gold fact_trades (dbt_project/models/marts/fact_trades.sql:13-22).
FACT_TRADES_SCHEMA = StructType(
    [
        StructField("trade_id", StringType()),
        StructField("symbol", StringType()),
        StructField("event_time", TimestampType()),
        StructField("event_date", DateType()),
        StructField("price", DoubleType()),
        StructField("quantity", DoubleType()),
        StructField("total_notional_usd", DoubleType()),
        StructField("dbt_updated_at", TimestampType()),
    ]
)

# Revenue fact fact_trade_fee_tax. First six fields match the reference
# output exactly (build_fact_fee_tax.py:65-73: event_date, symbol, region,
# traded_notional, fee_revenue, tax_collected); the trailing three
# (fee_rate_bps, tax_rate_bps, total_revenue) are a deliberate, documented
# extension — the applied rates and the combined total, which the
# reference computes internally (:60-63) but does not persist.
FACT_FEE_TAX_SCHEMA = StructType(
    [
        StructField("event_date", DateType()),
        StructField("symbol", StringType()),
        StructField("region", StringType()),
        StructField("traded_notional", DoubleType()),
        StructField("fee_revenue", DoubleType()),
        StructField("tax_collected", DoubleType()),
        StructField("fee_rate_bps", DoubleType()),
        StructField("tax_rate_bps", DoubleType()),
        StructField("total_revenue", DoubleType()),
    ]
)
