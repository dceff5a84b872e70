"""format("snapshot_table") — the Python DataSource over snapshot
tables. Batch reads resolve the manifest live set (pinnable by
version); streaming reads deliver one batch per version range with
offsets checkpointed by the engine, refuse rewrite crossings loudly,
and align evolved schemas to the stream's pinned schema.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.snapshots import (
    commit_snapshot,
    compact_snapshot,
    read_snapshot,
)
from binance_data_pipeline_spark.sources.snapshot_source import (
    register_snapshot_source,
)


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).selectExpr("id", f"'{tag}' as tag")


def test_batch_read_matches_read_snapshot_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 5, "x"))
    commit_snapshot(spark, t, _df(spark, 5, 9, "y"))
    register_snapshot_source(spark)
    got = spark.read.format("snapshot_table").option("path", t).load()
    assert sorted(r["id"] for r in got.collect()) == list(range(9))
    pinned = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("version", "0")
        .load()
    )
    assert sorted(r["id"] for r in pinned.collect()) == list(range(5))
    assert dict(got.dtypes) == dict(read_snapshot(spark, t).dtypes)


def test_stream_bootstrap_then_incremental_via_checkpoint(spark, tmp_path):
    t = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    commit_snapshot(spark, t, _df(spark, 0, 4, "x"))
    commit_snapshot(spark, t, _df(spark, 4, 6, "y"))
    register_snapshot_source(spark)

    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r["id"] for r in spark.read.parquet(out).collect())

    # first run bootstraps the whole table as one range
    assert drain() == list(range(6))
    # no new versions: the resumed stream delivers nothing new
    assert drain() == list(range(6))
    # one more commit: the resumed stream delivers ONLY the new rows
    commit_snapshot(spark, t, _df(spark, 6, 9, "z"))
    assert drain() == list(range(9))


def test_stream_starting_version_skips_history(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 4, "x"))
    commit_snapshot(spark, t, _df(spark, 4, 6, "y"))
    register_snapshot_source(spark)
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("starting_version", "0")
        .load()
        .writeStream.format("memory")
        .queryName("snap_sv")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.sql("select * from snap_sv").collect())
    assert got == [4, 5]


def test_stream_refuses_rewrite_crossing(spark, tmp_path):
    t = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    commit_snapshot(spark, t, _df(spark, 0, 4, "x"))
    register_snapshot_source(spark)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    commit_snapshot(spark, t, _df(spark, 4, 6, "y"))
    compact_snapshot(spark, t)  # dir identity changes: crossing
    q2 = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="cross a rewrite"):
        q2.awaitTermination(120)
        if q2.exception():
            raise q2.exception()


def test_stream_aligns_evolved_schema_to_pinned(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 2, "x"))
    register_snapshot_source(spark)
    stream = spark.readStream.format("snapshot_table").option("path", t).load()
    # evolve AFTER the stream pinned its schema: new column dropped,
    # missing column read as NULL
    commit_snapshot(
        spark, t,
        spark.range(2, 4).selectExpr("id", "'extra' as other"),
        evolve_schema=True,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("snap_ev")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["id"]: r["tag"] for r in spark.sql("select * from snap_ev").collect()}
    assert rows == {0: "x", 1: "x", 2: None, 3: None}
    assert "other" not in spark.sql("select * from snap_ev").columns
