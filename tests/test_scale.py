"""Scale-path operator tests: approximate sketches (error-bounded vs
exact), compaction, bucketed exchange-free joins, salted aggregation."""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binance_data_pipeline_spark.catalog import load_table
from binance_data_pipeline_spark.operators.scale import (
    approx_stats,
    compact_partitions,
    salted_agg,
    write_bucketed,
)


def test_approx_stats_error_bounded(spark):
    e = load_table(spark, "/root/testdata/sf0.01", "events")
    got = approx_stats(e, ["event_type"], "user_id", rsd=0.05).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for r in got:
        err = abs(r["approx_distinct"] - exact[r["event_type"]]) / exact[r["event_type"]]
        assert err < 0.15, f"{r['event_type']}: {err}"
        assert len(r["approx_quantiles"]) == 3


def test_compact_partitions(spark, tmp_path):
    path = str(tmp_path / "many_files")
    df = spark.range(2000).select(
        "id", (F.col("id") % 3).cast("string").alias("part")
    )
    # deliberately fragment: 20 files per partition
    df.repartition(60).write.partitionBy("part").parquet(path)
    before = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    assert before > 10
    after = compact_partitions(spark, path, ["part"], target_files_per_partition=1)
    assert after <= 3  # one file per partition value
    assert spark.read.parquet(path).count() == 2000


def test_bucketed_join_no_shuffle_exchange(spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT a shuffle exchange
    (broadcast disabled so the sort-merge path — the 100 TB case where
    neither side broadcasts — is what's planned)."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    # a previous session's metastore is gone but its warehouse dirs remain;
    # saveAsTable refuses to reuse an existing location
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(o, "orders_b", "o_orderkey", 4)
    write_bucketed(li, "lineitem_b", "l_orderkey", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join must not shuffle:\n{plan}"
        )
        assert "SortMergeJoin" in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_salted_agg_matches_plain(spark):
    e = load_table(spark, "/root/testdata/sf0.01", "events")
    plain = {
        (r["event_type"],): (round(r["s"], 4), r["c"], round(r["mn"], 4), round(r["mx"], 4))
        for r in e.groupBy("event_type")
        .agg(
            F.sum("value").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (round(r["s"], 4), r["c"], round(r["mn"], 4), round(r["mx"], 4))
        for r in salted_agg(
            e,
            ["event_type"],
            {
                "s": (F.sum("value"), F.sum),
                "c": (F.count(F.lit(1)), F.sum),
                "mn": (F.min("value"), F.min),
                "mx": (F.max("value"), F.max),
            },
        ).collect()
    }
    assert plain == salted


def test_z_value_interleaves_bits(spark):
    """Known Morton pattern: (x=0b11, y=0b01) with 2 bits → z = 0b0111
    (x bits at even positions, y bits at odd)."""
    from binance_data_pipeline_spark.operators.scale import z_value

    df = spark.createDataFrame([(0b11, 0b01)], "x LONG, y LONG")
    got = df.select(z_value(["x", "y"], bits=2).alias("z")).first()["z"]
    assert got == 0b0111, bin(got)


def test_zorder_write_gives_both_columns_locality(spark, tmp_path):
    """The point of Z-ORDER: after clustering on (x, y), EVERY file covers
    a small min-max range of BOTH columns (→ parquet stats prune files for
    filters on either). A plain sort by x would leave y's per-file range at
    ~the global range."""
    import pyarrow.parquet as pq

    from binance_data_pipeline_spark.operators.scale import zorder_write

    n = 20_000
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 10_000).alias("x"),
        (F.hash(F.col("id") + 1_000_000) % 10_000).alias("y"),
    )
    path = str(tmp_path / "zordered")
    zorder_write(df, path, ["x", "y"], bits=8, num_files=16)

    import glob
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) >= 8

    def avg_range(col):
        spans = []
        for f in files:
            md = pq.read_metadata(f)
            mn = min(md.row_group(i).column(0 if col == "x" else 1).statistics.min
                     for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(0 if col == "x" else 1).statistics.max
                     for i in range(md.num_row_groups))
            spans.append(mx - mn)
        return sum(spans) / len(spans)

    global_span = 20_000  # hash % 10_000 spans ±10_000
    # 16 files on a 2-D curve ≈ 4×4 tiles → per-file span ≈ 1/4 global;
    # allow generous slack for tile boundary crossings
    assert avg_range("x") < 0.55 * global_span
    assert avg_range("y") < 0.55 * global_span
    # round-trip: clustering must not change the data
    assert spark.read.parquet(path).count() == n


def test_salted_agg_rejects_mergeless_exprs(spark):
    """The old list API silently summed MIN/MAX partials — wrong results
    with no error. The dict API makes that misuse fail loudly."""
    import pytest

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    with pytest.raises(TypeError, match="merge"):
        salted_agg(e, ["event_type"], [F.min("value").alias("mn")])
    with pytest.raises(TypeError, match="merge_fn"):
        salted_agg(e, ["event_type"], {"mn": F.min("value")})


# ----------------------------------------------------------- lifecycle

def test_release_barriers_frees_checkpoint_blocks(spark):
    """Eager localCheckpoint barriers (dedup/similarity intermediates) pin
    executor-storage blocks until released; release_barriers must free
    every one of them once results are consumed — the between-queries
    contract bench.py and job boundaries rely on."""
    from binance_data_pipeline_spark.lifecycle import (
        barrier_scope,
        persistent_rdd_count,
        release_barriers,
    )

    release_barriers(spark)  # clean slate (other tests may have persisted)
    base = persistent_rdd_count(spark)

    ck = spark.range(10_000).localCheckpoint(eager=True)
    ck2 = spark.range(100).localCheckpoint(eager=True)
    assert persistent_rdd_count(spark) >= base + 2
    assert ck.count() == 10_000 and ck2.count() == 100  # consume

    released = release_barriers(spark)
    assert released >= 2
    assert persistent_rdd_count(spark) == 0

    # context-manager form: blocks created inside are gone on exit
    with barrier_scope(spark):
        inner = spark.range(500).localCheckpoint(eager=True)
        assert inner.count() == 500
        assert persistent_rdd_count(spark) >= 1
    assert persistent_rdd_count(spark) == 0
