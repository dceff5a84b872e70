"""Revenue fact job: silver → fact_trade_fee_tax (§3.4,
producer/build_fact_fee_tax.py:47-109).

Pipeline: parameterized date slice (S8) → group-by-sum daily notional (A1)
→ LEFT JOIN broadcast rules dim (J1) → defaults region='EU', rates=0.0
(F12, :58-60) → fee/tax = notional × bps/10000 (F11, :62-63) → fixed
column projection (P6, :65-73).

Scale: the date predicate prunes partitions; the agg is one shuffle onto
(date, symbol) — tiny output; the dim join broadcasts. The output append is
partition-local.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Reference parity (build_fact_fee_tax.py:65-73): event_date, symbol,
# region, traded_notional, fee_revenue, tax_collected — names match the
# reference exactly so downstream consumers can switch engines without a
# schema migration. DELIBERATE EXTENSION beyond the reference: the applied
# rates (fee_rate_bps, tax_rate_bps) and the combined total_revenue are
# also emitted — the reference drops the rates after applying them, which
# makes fee audits impossible downstream.
FACT_COLUMNS = [
    "event_date",
    "symbol",
    "region",
    "traded_notional",
    "fee_revenue",
    "tax_collected",
    "fee_rate_bps",
    "tax_rate_bps",
    "total_revenue",
]


def silver_slice(silver: DataFrame, process_date: date) -> DataFrame:
    """WHERE event_date = @process_date (S8/P7,
    build_fact_fee_tax.py:26-34) — partition-pruned scan."""
    return silver.where(F.col("event_date") == F.lit(process_date)).select(
        "event_date", "symbol", "traded_notional"
    )


def daily_notional(slice_df: DataFrame) -> DataFrame:
    """groupby(event_date, symbol).sum(traded_notional) (A1, :51-53)."""
    return slice_df.groupBy("event_date", "symbol").agg(
        F.sum("traded_notional").alias("traded_notional")
    )


def build_fact_fee_tax(slice_df: DataFrame, rules: DataFrame) -> DataFrame:
    """Aggregated notional × broadcast rules → fee/tax fact (:55-73)."""
    agg = daily_notional(slice_df)
    joined = agg.join(F.broadcast(rules), "symbol", "left")
    return (
        joined.select(
            "event_date",
            "symbol",
            F.coalesce("region", F.lit("EU")).alias("region"),
            "traded_notional",
            F.coalesce("fee_rate_bps", F.lit(0.0)).alias("fee_rate_bps"),
            F.coalesce("tax_rate_bps", F.lit(0.0)).alias("tax_rate_bps"),
        )
        .withColumn("fee_revenue", F.col("traded_notional") * F.col("fee_rate_bps") / 10000.0)
        .withColumn("tax_collected", F.col("traded_notional") * F.col("tax_rate_bps") / 10000.0)
        .withColumn("total_revenue", F.col("fee_revenue") + F.col("tax_collected"))
        .select(*FACT_COLUMNS)
    )


def run(silver: DataFrame, rules: DataFrame, process_date: date, out_path: str | None = None) -> DataFrame:
    """Full §3.4 entry point (build_fact_fee_tax.main, :97-109). Dual-write
    collapses to one parquet append (the engine's warehouse is parquet);
    empty input short-circuits (P10, :48-49)."""
    fact = build_fact_fee_tax(silver_slice(silver, process_date), rules)
    if out_path is not None and not fact.isEmpty():
        fact.write.mode("append").partitionBy("event_date").parquet(out_path)
    return fact
