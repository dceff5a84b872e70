"""Incremental materialization: the reference's flagship transform pattern
(dbt incremental model fact_trades, dbt_project/models/marts/fact_trades.sql).

Semantics reproduced exactly (P8 + ST5, documented fidelity decisions):
  - high-watermark filter: only rows with event_time > max(event_time) of
    the existing table are considered (fact_trades.sql:25-27). This
    SILENTLY DROPS late data below the watermark — reference behavior,
    kept by default; ``late_policy="keep"`` offers the corrected variant.
  - unique_key dedup: one row per trade_id among the appended batch
    (fact_trades.sql:4 ``unique_key='trade_id'``), deterministic keeper
    (earliest event_time, then lowest id) — BigQuery MERGE keeps the
    incoming row; with a deduped increment the result is identical.
  - day-partitioned output (fact_trades.sql:5-9) → partitionBy(event_date).
  - audit column dbt_updated_at = current_timestamp() (fact_trades.sql:21).

Scale: the watermark read is a one-row agg on the partitioned fact (scans
partition stats only under AQE); the increment filter pushes into the
source scan; the append writes only new day partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_high_watermark(spark: SparkSession, fact_path: str, ts_col: str = "event_time"):
    """max(ts) of the existing fact, None if the table doesn't exist yet
    (first run = full load, dbt's is_incremental() == false branch)."""
    if not os.path.exists(fact_path):
        return None
    return spark.read.parquet(fact_path).agg(F.max(ts_col).alias("hwm")).first()["hwm"]


def build_fact_increment(
    staging: DataFrame,
    hwm,
    unique_key: str = "trade_id",
    ts_col: str = "event_time",
    late_policy: str = "drop",
) -> DataFrame:
    """staging slice → fact rows (fact_trades.sql:13-27).

    late_policy="drop": reference parity — rows at/below the watermark are
    discarded (the dbt filter). "keep": no watermark filter; dedup against
    the increment only (caller must then merge on unique_key downstream).
    """
    inc = staging
    if hwm is not None and late_policy == "drop":
        inc = inc.where(F.col(ts_col) > F.lit(hwm))
    w = Window.partitionBy(unique_key).orderBy(ts_col, unique_key)
    return (
        inc.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("total_notional_usd", F.col("price") * F.col("quantity"))
        .withColumn("dbt_updated_at", F.current_timestamp())
    )


def merge_upsert(
    spark: SparkSession,
    increment: DataFrame,
    fact_path: str,
    unique_key: str = "trade_id",
    ts_col: str = "event_time",
    partition_col: str = "event_date",
) -> int:
    """True MERGE semantics: incoming rows REPLACE existing rows with the
    same key (latest ts wins) — what the dbt/BigQuery merge actually does
    for matched keys, vs. the append path's insert-only behavior.

    Parquet has no row-level update, so this rewrites exactly the
    partitions the increment touches: read those partitions, union, keep
    the newest row per key, dynamic-partition-overwrite them back. At scale
    the rewrite cost is proportional to touched partitions (days), not the
    table. Returns rows written.
    """
    if not os.path.exists(fact_path):
        out = exact_dedup_latest(increment, unique_key, ts_col)
        n = out.count()
        out.write.mode("overwrite").partitionBy(partition_col).parquet(fact_path)
        return n
    touched = [r[0] for r in increment.select(partition_col).distinct().collect()]
    existing = spark.read.parquet(fact_path).where(F.col(partition_col).isin(touched))
    merged = exact_dedup_latest(
        existing.unionByName(increment, allowMissingColumns=True), unique_key, ts_col
    )
    n = merged.count()
    _write_dynamic_partitions(spark, merged, partition_col, fact_path)
    return n


def _write_dynamic_partitions(spark, df: DataFrame, partition_col: str, path: str) -> None:
    """Partitioned overwrite in DYNAMIC mode (replace only the touched
    partitions), with the session conf restored afterwards — leaking
    dynamic mode onto a shared session silently changes every later
    ``mode("overwrite").partitionBy(...)`` from table-truncate to
    partial-replace (stale partitions would survive a "full rebuild")
    and drops the _SUCCESS marker."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def exact_dedup_latest(df: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Newest row per key (ts desc, key tiebreak) — the MERGE winner rule."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).desc(), F.col(key))
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def incremental_append(
    spark: SparkSession,
    staging: DataFrame,
    fact_path: str,
    unique_key: str = "trade_id",
    ts_col: str = "event_time",
    partition_col: str = "event_date",
    late_policy: str = "drop",
) -> int:
    """One incremental run: read hwm → filter → dedup → append partitioned.

    Returns the number of appended rows. Idempotence: re-running with no
    new source rows appends nothing (everything is ≤ hwm); re-ingesting a
    3-day window (the reference's daily lookback job) only lands rows above
    the watermark, and the unique_key dedup collapses in-batch duplicates —
    the same guarantees the dbt merge provides.
    """
    hwm = read_high_watermark(spark, fact_path, ts_col)
    inc = build_fact_increment(staging, hwm, unique_key, ts_col, late_policy)
    # keep-policy must also exclude keys already in the fact (merge insert)
    if hwm is not None and late_policy == "keep":
        existing = spark.read.parquet(fact_path).select(unique_key)
        inc = inc.join(existing, unique_key, "left_anti")
    n = inc.count()
    if n:
        inc.write.mode("append").partitionBy(partition_col).parquet(fact_path)
    return n
