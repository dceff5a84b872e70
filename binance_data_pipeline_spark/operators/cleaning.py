"""Bronze → staging cleaning/casting (P4/P5) and bronze record shaping (P3).

Reference semantics preserved exactly:
  - price/quantity arrive as wire STRINGS; cast to double with
    coerce-to-null (pandas ``to_numeric(errors="coerce")`` ≡ Spark ANSI-safe
    try_cast — ingest_binance_last_3_days.py:56-57,
    stg_binance_trades.sql:11-12)
  - trade_id cast to STRING (:58, stg sql:8)
  - event_time from epoch ms, UTC (:55)
  - event_date = date(event_time) (stg sql:13)
  - missing columns tolerated → null (P3, kafka_to_s3_bronze.py:30-46)

All built-ins; the whole stage fuses into the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas


def raw_to_bronze(flat: DataFrame) -> DataFrame:
    """Flat wire records (epoch-ms longs, string decimals) → bronze rows
    (kafka_to_s3_bronze.py:30-54): timestamps materialized, date/hour
    partition columns derived per-row (strictly more correct than the
    reference's first-record-of-batch partition key, :63-64)."""
    cols = set(flat.columns)

    def opt(name: str, typ: str):
        return F.col(name) if name in cols else F.lit(None).cast(typ)

    return flat.select(
        opt("trade_id", "long").cast("string").alias("trade_id"),
        opt("symbol", "string").alias("symbol"),
        opt("price", "string").alias("price"),
        opt("quantity", "string").alias("quantity"),
        F.timestamp_millis(opt("event_time", "long")).alias("event_time"),
        F.timestamp_millis(opt("trade_time", "long")).alias("trade_time"),
        opt("buyer_order_id", "long").alias("buyer_order_id"),
        opt("seller_order_id", "long").alias("seller_order_id"),
        opt("is_buyer_maker", "boolean").alias("is_buyer_maker"),
        F.coalesce(
            F.timestamp_millis(opt("ingest_time", "long")), F.current_timestamp()
        ).alias("ingest_time"),
        F.to_date(F.timestamp_millis(opt("event_time", "long"))).alias("event_date"),
        F.lpad(F.hour(F.timestamp_millis(opt("event_time", "long"))).cast("string"), 2, "0").alias(
            "hour"
        ),
    )


def bronze_to_staging(bronze: DataFrame) -> DataFrame:
    """The stg_binance_trades view (stg_binance_trades.sql:5-15):
    rename/cast projection — trade_id string, price/quantity float64 with
    invalid→null, event_date derived. Unmaterialized (a view), exactly like
    the reference's dbt view materialization (dbt_project.yml:23-24)."""
    return bronze.select(
        F.col("trade_id").cast("string").alias("trade_id"),
        F.col("symbol"),
        # try_cast ≡ pandas to_numeric(errors="coerce"): invalid strings →
        # null instead of ANSI cast errors
        F.col("price").try_cast("double").alias("price"),
        F.col("quantity").try_cast("double").alias("quantity"),
        F.col("event_time"),
        F.to_date("event_time").alias("event_date"),
    )


def staging_schema_check(df: DataFrame) -> None:
    """Assert the staging contract matches the pinned schema (engine rule:
    no silent drift; the reference relies on BigQuery autodetect)."""
    expected = {f.name: f.dataType for f in schemas.STAGING_TRADE_SCHEMA.fields}
    actual = {f.name: f.dataType for f in df.schema.fields}
    missing = {k: v for k, v in expected.items() if actual.get(k) != v}
    if missing:
        raise ValueError(f"staging schema drift: {missing} (actual: {actual})")
