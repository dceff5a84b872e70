"""Continuous aggregate maintenance — the hypertable-rollup pattern:
keep a bucketed aggregate table (hourly OHLCV, daily revenue) fresh as
raw rows arrive, recomputing only the buckets the new rows touch.

An aggregate row cannot be merged row-wise the way a fact MERGE can
(``operators/incremental.py``): one late raw row invalidates its whole
bucket. So the maintenance contract is bucket-granular:

  1. read the stored watermark (max raw ``ts_col`` seen by the last
     refresh — a one-row marker beside the rollup table);
  2. the increment is raw rows above it (predicate pushed to the scan);
  3. the touched-bucket set is the increment's distinct buckets — an
     O(#buckets) driver list, not data;
  4. recompute those buckets FROM RAW (all their rows, old + new —
     partition/filter pruning keeps this ∝ touched buckets) and
     dynamic-partition-overwrite them into the rollup table;
  5. advance the watermark (written LAST — a crash before this line
     re-refreshes the same buckets on the next run: idempotent, since
     bucket recompute is a pure overwrite).

Late data is the point: a row arriving days late lands in an old
bucket, which simply gets recomputed — where the reference's
high-watermark filter silently drops it
(dbt_project/models/marts/fact_trades.sql:25-27; its repair story is a
manual 3-day re-ingest DAG, airflow/dags/ingest_binance_last_3_days.py).

Scale: refresh cost is O(increment scan + touched-bucket recompute);
an idle refresh (no new rows) is one pushed-down scan returning zero
rows. The rollup table is hive-partitioned on the bucket, so readers
prune and the overwrite replaces only touched partitions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException


def _read_watermark(spark: SparkSession, marker_path: str):
    try:
        row = spark.read.parquet(marker_path).first()
        return None if row is None else row["hwm"]
    except AnalysisException:
        return None


def refresh_continuous_aggregate(
    spark: SparkSession,
    raw: DataFrame,
    rollup_path: str,
    agg_fn: Callable[[DataFrame], DataFrame],
    ts_col: str,
    bucket_col: str = "bucket",
    bucket_expr: Column | None = None,
) -> dict:
    """One refresh of the continuous aggregate at ``rollup_path``.

    ``raw`` is the raw relation (keep it a plain scan so the increment
    filter and the touched-bucket recompute both push down).
    ``agg_fn(raw_with_bucket) -> DataFrame`` computes the aggregate and
    MUST group by (at least) ``bucket_col``, which this function attaches
    to its input beforehand (``bucket_expr`` defaults to the existing
    ``bucket_col`` column; pass e.g. ``date_trunc('hour', ts)`` to derive
    it). First run materializes the full aggregate.

    Returns {"touched_buckets", "rows_written", "hwm"}."""
    out = rollup_path.rstrip("/")
    table_path = f"{out}/table.parquet"
    marker_path = f"{out}/_watermark.parquet"

    expr = bucket_expr if bucket_expr is not None else F.col(bucket_col)
    bucketed = raw.withColumn(bucket_col, expr)
    hwm = _read_watermark(spark, marker_path)

    if hwm is None:
        increment = bucketed
    else:
        increment = bucketed.where(F.col(ts_col) > F.lit(hwm))

    probe = increment.agg(
        F.max(ts_col).alias("new_hwm"),
        F.collect_set(bucket_col).alias("touched"),
    ).first()
    new_hwm, touched = probe["new_hwm"], probe["touched"]
    if new_hwm is None:  # no new rows: idle refresh, nothing to do
        return {"touched_buckets": 0, "rows_written": 0, "hwm": hwm}

    if hwm is None:
        result = agg_fn(bucketed)
        _check_bucket(result, bucket_col)
        n = result.count()
        result.write.mode("overwrite").partitionBy(bucket_col).parquet(table_path)
    else:
        scope = bucketed.where(F.col(bucket_col).isin(touched))
        result = agg_fn(scope)
        _check_bucket(result, bucket_col)
        n = result.count()
        # scoped: dynamic mode must not leak onto the shared session
        # (it silently turns later full-table partitioned overwrites
        # into partial replaces) — see incremental._write_dynamic_partitions
        from .incremental import _write_dynamic_partitions

        _write_dynamic_partitions(spark, result, bucket_col, table_path)

    # watermark LAST: a crash above leaves the old marker and the next
    # refresh redoes the same buckets — overwrite-idempotent
    spark.createDataFrame([(new_hwm,)], f"hwm {dict(bucketed.dtypes)[ts_col]}").coalesce(
        1
    ).write.mode("overwrite").parquet(marker_path)
    return {"touched_buckets": len(touched), "rows_written": n, "hwm": new_hwm}


def _check_bucket(result: DataFrame, bucket_col: str) -> None:
    if bucket_col not in result.columns:
        raise ValueError(
            f"agg_fn result must carry the bucket column {bucket_col!r} "
            f"(got columns {result.columns})"
        )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The current aggregate table."""
    return spark.read.parquet(f"{rollup_path.rstrip('/')}/table.parquet")
