"""Scalar function catalog (SURVEY §2.7 F1-F15) — the reference's scalar
surface as named, reusable Column builders. Everything is a built-in
composition (JVM codegen); nothing here is a UDF.

| ref | function | reference citation |
|-----|----------|--------------------|
| F1  | json_serialize        | binance_ws_to_kafka.py:37 |
| F2  | (json parse)          | sources/json_envelope.py (json_tuple) |
| F3  | lower — use F.lower   | binance_ws_to_kafka.py:65 |
| F4  | stream_name, s3_key   | binance_ws_to_kafka.py:47, kafka_to_s3_bronze.py:50-54 |
| F5  | epoch_ms_to_ts        | kafka_to_s3_bronze.py:50 |
| F6  | ts_to_date — F.to_date| stg_binance_trades.sql:13 |
| F7  | now_epoch_ms          | binance_ws_to_kafka.py:80 |
| F8  | audit_ts              | fact_trades.sql:21 |
| F9  | to_double_coerce      | ingest_binance_last_3_days.py:56-57 |
| F10 | to_string — cast      | ingest_binance_last_3_days.py:58 |
| F11 | notional, bps_to_rate | fact_trades.sql:20, build_fact_fee_tax.py:62-63 |
| F12 | with_default          | build_fact_fee_tax.py:58-60 |
| F13 | iso_date              | ingest_binance_last_3_days.py:109 |
| F14 | date arithmetic — F.date_add/sequence | ingest_...py:110-125 |
| F15 | row_uuid              | ingest_...py:76 (file names; data-side uuid) |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_serialize(*cols: str) -> Column:
    """Compact JSON of the given columns (F1)."""
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def stream_name(symbol: Column | str) -> Column:
    """Binance combined-stream name: `<symbol-lower>@trade` (F3+F4)."""
    return F.concat(F.lower(symbol), F.lit("@trade"))


def s3_object_key(prefix: str) -> Column:
    """Hive-style object key `<prefix>/date=YYYY-MM-DD/hour=HH/part-<ms>`
    from event_time (F4, kafka_to_s3_bronze.py:50-54) — illustrative; the
    parquet sink derives real partition paths itself."""
    return F.concat(
        F.lit(prefix + "/date="),
        F.date_format("event_time", "yyyy-MM-dd"),
        F.lit("/hour="),
        F.lpad(F.hour("event_time").cast("string"), 2, "0"),
        F.lit("/part-"),
        F.unix_millis(F.col("event_time")).cast("string"),
        F.lit(".parquet"),
    )


def epoch_ms_to_ts(col: Column | str) -> Column:
    """Epoch milliseconds → UTC timestamp (F5)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def now_epoch_ms() -> Column:
    """Current time as epoch ms (F7)."""
    return F.unix_millis(F.current_timestamp())


def audit_ts() -> Column:
    """Audit column value (F8, dbt_updated_at)."""
    return F.current_timestamp()


def to_double_coerce(col: Column | str) -> Column:
    """String → double, invalid → null (F9; pandas to_numeric parity)."""
    return (F.col(col) if isinstance(col, str) else col).try_cast("double")


def notional(price: Column | str, qty: Column | str) -> Column:
    """price × quantity (F11, total_notional_usd)."""
    return F.col(price) * F.col(qty) if isinstance(price, str) else price * qty


def bps_to_rate(bps: Column | str) -> Column:
    """Basis points → rate (F11, build_fact_fee_tax.py:62-63)."""
    return (F.col(bps) if isinstance(bps, str) else bps) / F.lit(10000.0)


def with_default(col: Column | str, default) -> Column:
    """Null → per-column default (F12, fillna parity)."""
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(default))


def iso_date(col: Column | str) -> Column:
    """Date → 'YYYY-MM-DD' string (F13)."""
    return F.date_format(col, "yyyy-MM-dd")


def row_uuid() -> Column:
    """Random UUID per row (F15) — nondeterministic by nature; excluded
    from oracle-checked queries."""
    return F.expr("uuid()")
