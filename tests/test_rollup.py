"""Continuous aggregate: first refresh materializes the full rollup;
incremental refreshes recompute ONLY touched buckets (late rows repair
their old bucket — the case the reference's watermark filter drops);
idle refreshes are no-ops; untouched partition files are not rewritten."""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.rollup import (
    read_rollup,
    refresh_continuous_aggregate,
)


def _agg(df):
    return df.groupBy("bucket", "sym").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.round(F.sum(F.col("price") * F.col("qty")), 4).alias("notional"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
    )


def _write_raw(spark, path, rows, mode="append"):
    spark.createDataFrame(
        rows, "trade_id long, ts long, sym string, price double, qty double"
    ).write.mode(mode).parquet(path)


def _refresh(spark, raw_path, rollup):
    raw = spark.read.parquet(raw_path)
    return refresh_continuous_aggregate(
        spark, raw, rollup, _agg, ts_col="ts",
        bucket_expr=(F.floor(F.col("ts") / 100) * 100).cast("long"),
    )


def _rows(df):
    """Canonical (sorted-column) row tuples — partitioned reads put the
    partition column last."""
    cols = sorted(df.columns)
    return sorted(map(tuple, df.select(*cols).collect()))


def _oracle(spark, raw_path):
    raw = spark.read.parquet(raw_path).withColumn(
        "bucket", (F.floor(F.col("ts") / 100) * 100).cast("long")
    )
    return _rows(_agg(raw))


def test_continuous_aggregate_lifecycle(spark, tmp_path):
    raw_path = str(tmp_path / "raw")
    rollup = str(tmp_path / "rollup")

    _write_raw(spark, raw_path, [
        (1, 110, "A", 10.0, 1.0), (2, 150, "A", 12.0, 2.0),
        (3, 210, "A", 11.0, 1.0), (4, 250, "B", 5.0, 4.0),
    ])
    s1 = _refresh(spark, raw_path, rollup)
    assert s1["hwm"] == 250 and s1["rows_written"] == 3
    assert _rows(read_rollup(spark, rollup)) == _oracle(spark, raw_path)

    # idle refresh: no new rows → no work, watermark unchanged
    s2 = _refresh(spark, raw_path, rollup)
    assert s2 == {"touched_buckets": 0, "rows_written": 0, "hwm": 250}

    # incremental: one new bucket (300s) + one LATE row into bucket 100
    files_before = {
        f for f in glob.glob(f"{rollup}/table.parquet/bucket=200/*.parquet")
    }
    _write_raw(spark, raw_path, [
        (5, 310, "A", 9.0, 1.0),       # new bucket
        (6, 260, "A", 99.0, 1.0),      # ts above hwm, lands in bucket 200
    ])
    s3 = _refresh(spark, raw_path, rollup)
    assert s3["touched_buckets"] == 2 and s3["hwm"] == 310
    assert _rows(read_rollup(spark, rollup)) == _oracle(spark, raw_path)
    # bucket 200 was rewritten (touched), bucket 100 was not
    files_after_200 = set(glob.glob(f"{rollup}/table.parquet/bucket=200/*.parquet"))
    assert files_after_200 != files_before
    assert glob.glob(f"{rollup}/table.parquet/bucket=100/*.parquet")  # intact


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    raw_path = str(tmp_path / "raw")
    rollup = str(tmp_path / "rollup")
    _write_raw(spark, raw_path, [(1, 110, "A", 10.0, 1.0), (2, 210, "A", 11.0, 1.0)])
    _refresh(spark, raw_path, rollup)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{rollup}/table.parquet/bucket=100/*.parquet")
    }
    _write_raw(spark, raw_path, [(3, 290, "A", 12.0, 1.0)])  # touches 200 only
    s = _refresh(spark, raw_path, rollup)
    assert s["touched_buckets"] == 1
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{rollup}/table.parquet/bucket=100/*.parquet")
    }
    assert before == after  # dynamic overwrite left the 100-bucket alone


def test_agg_fn_must_carry_bucket(spark, tmp_path):
    raw_path = str(tmp_path / "raw")
    _write_raw(spark, raw_path, [(1, 110, "A", 10.0, 1.0)])
    raw = spark.read.parquet(raw_path)
    with pytest.raises(ValueError, match="bucket column"):
        refresh_continuous_aggregate(
            spark, raw, str(tmp_path / "r"),
            lambda d: d.groupBy("sym").count(),
            ts_col="ts",
            bucket_expr=(F.floor(F.col("ts") / 100) * 100).cast("long"),
        )


def test_timestamp_buckets_on_real_events(spark, tmp_path):
    """Hourly OHLCV continuous aggregate over the real events fixture:
    result equals the direct batch aggregate."""
    from binance_data_pipeline_spark.catalog import load_table

    rollup = str(tmp_path / "rollup")
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "event_type", "value"
    )

    def agg(df):
        return df.groupBy("bucket", "event_type").agg(
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max("value"), 4).alias("high"),
            F.count(F.lit(1)).alias("n"),
        )

    s = refresh_continuous_aggregate(
        spark, events, rollup, agg, ts_col="ts",
        bucket_expr=F.date_trunc("hour", F.col("ts")),
    )
    assert s["rows_written"] > 0
    direct = _rows(agg(events.withColumn("bucket", F.date_trunc("hour", F.col("ts")))))
    assert _rows(read_rollup(spark, rollup)) == direct


def test_dynamic_overwrite_mode_never_leaks(spark, tmp_path):
    """Regression (r12): the incremental-refresh path flips the session
    to dynamic partition-overwrite for ITS write only. Leaking it turns
    every later full-table `mode("overwrite").partitionBy(...)` in the
    shared session into a partial replace (stale partitions survive a
    "rebuild") and drops the _SUCCESS marker — exactly how the IVF
    index test caught it when suite sharding reordered modules."""
    import os

    from binance_data_pipeline_spark.operators.rollup import (
        refresh_continuous_aggregate,
    )

    rollup = str(tmp_path / "rollup")
    rows = [(i, f"e{i % 2}", float(i)) for i in range(20)]
    events = spark.createDataFrame(rows, "bucket_src int, event_type string, value double")

    def agg(df):
        return df.groupBy("bucket", "event_type").agg(F.count(F.lit(1)).alias("n"))

    for _ in range(2):  # second refresh takes the incremental (dynamic) leg
        refresh_continuous_aggregate(
            spark, events, rollup, agg, ts_col="bucket_src",
            bucket_expr=(F.col("bucket_src") % 4),
        )
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == "static"
    )

    # a later unrelated partitioned overwrite keeps STATIC semantics:
    # full truncate (the p=1 partition disappears) + _SUCCESS marker
    tbl = str(tmp_path / "unrelated")
    spark.createDataFrame([(0, "a"), (1, "b")], "p int, v string").write.mode(
        "overwrite"
    ).partitionBy("p").parquet(tbl)
    spark.createDataFrame([(0, "c")], "p int, v string").write.mode(
        "overwrite"
    ).partitionBy("p").parquet(tbl)
    assert os.path.exists(os.path.join(tbl, "_SUCCESS"))
    assert not any(d.startswith("p=1") for d in os.listdir(tbl))
