"""Data skipping: stats match per-file truth, range pruning keeps
exactly the intersecting files (conservatively keeping NULL-stats
files), pruned reads return the same rows as a full scan + filter while
opening fewer files, and random layout degrades to keep-everything
rather than wrong answers."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.skipping import (
    build_skipping_index,
    collect_file_stats,
    prune_files,
    pruned_read,
)


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    # range layout: 8 files with disjoint id ranges, ids 0..799
    path = str(tmp_path_factory.mktemp("skip") / "t.parquet")
    df = spark.range(800).select(
        F.col("id"), (F.col("id") % 10).alias("mod"), (F.col("id") * 2).alias("v")
    )
    df.repartitionByRange(8, "id").write.parquet(path)
    return path


def test_stats_match_truth(spark, clustered):
    stats = collect_file_stats(spark, clustered, ["id", "v"]).collect()
    assert len(stats) == 8
    assert sum(r["n_rows"] for r in stats) == 800
    assert min(r["id_min"] for r in stats) == 0
    assert max(r["id_max"] for r in stats) == 799
    for r in stats:  # v = 2*id rides the same clustering
        assert r["v_min"] == 2 * r["id_min"] and r["v_max"] == 2 * r["id_max"]
        assert r["id_nulls"] == 0
    # disjoint ranges: files ordered by min don't overlap
    spans = sorted((r["id_min"], r["id_max"]) for r in stats)
    assert all(spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1))


def test_pruned_read_fewer_files_same_rows(spark, clustered):
    stats = collect_file_stats(spark, clustered, ["id"])
    df, report = pruned_read(spark, clustered, stats, {"id": (150, 160)})
    assert report["files_kept"] < report["files_total"] == 8
    got = sorted(r["id"] for r in df.filter(F.col("id").between(150, 160)).collect())
    want = sorted(
        r["id"]
        for r in spark.read.parquet(clustered)
        .filter(F.col("id").between(150, 160))
        .collect()
    )
    assert got == want and len(got) == 11
    assert len(df.inputFiles()) == report["files_kept"]


def test_open_ended_and_multi_column_predicates(spark, clustered):
    stats = collect_file_stats(spark, clustered, ["id", "v"])
    kept_hi, _ = prune_files(stats, {"id": (700, None)})
    assert len(kept_hi) <= 2  # only the top range file(s)
    kept_both, _ = prune_files(stats, {"id": (0, 99), "v": (1000, None)})
    assert kept_both == []  # id<100 files have v<200: ranges contradict


def test_out_of_range_returns_empty_with_schema(spark, clustered):
    stats = collect_file_stats(spark, clustered, ["id"])
    df, report = pruned_read(spark, clustered, stats, {"id": (5000, 6000)})
    assert report["files_kept"] == 0
    assert df.columns == ["id", "mod", "v"] and df.count() == 0


def test_null_stats_kept_conservatively(spark, tmp_path):
    path = str(tmp_path / "nulls.parquet")
    spark.createDataFrame(
        [(1, None), (2, None)], "id long, x double"
    ).coalesce(1).write.parquet(path)
    stats = collect_file_stats(spark, path, ["x"])
    kept, report = prune_files(stats, {"x": (0.0, 1.0)})
    assert report["files_kept"] == 1  # all-NULL stats: cannot skip


def test_random_layout_degrades_to_no_op(spark, tmp_path):
    path = str(tmp_path / "rand.parquet")
    df = spark.range(800).select((F.xxhash64("id") % 1000).alias("h"), "id")
    df.repartition(8).write.parquet(path)  # h scattered across every file
    stats = collect_file_stats(spark, path, ["h"])
    _, report = prune_files(stats, {"h": (0, 10)})
    assert report["files_kept"] == report["files_total"]  # visible, not wrong


def test_partition_columns_survive_file_list_read(spark, tmp_path):
    path = str(tmp_path / "part.parquet")
    df = spark.range(100).select(
        "id", (F.col("id") % 2).alias("side"), (F.col("id") * 3).alias("v")
    )
    df.write.partitionBy("side").parquet(path)
    stats = collect_file_stats(spark, path, ["id"])
    out, _ = pruned_read(spark, path, stats, {"id": (0, 99)})
    assert "side" in out.columns
    assert out.select("side").distinct().count() == 2


def test_persisted_index_roundtrip(spark, clustered, tmp_path):
    idx = str(tmp_path / "idx.parquet")
    n = build_skipping_index(spark, clustered, ["id"], idx)
    assert n == 8
    stats = spark.read.parquet(idx)
    kept, report = prune_files(stats, {"id": (0, 50)})
    assert report["files_kept"] == 1 and len(kept) == 1


def test_survivor_cap_guards_driver_materialization(spark, clustered):
    """Only survivor paths reach the driver, and max_driver_files bounds
    even that: a keep-everything predicate over the cap raises with the
    scan-with-a-filter guidance instead of materializing the listing."""
    stats = collect_file_stats(spark, clustered, ["id"])
    with pytest.raises(ValueError, match="max_driver_files"):
        prune_files(stats, {"id": (None, None)}, max_driver_files=3)
    # a selective predicate under the cap still works
    kept, report = prune_files(stats, {"id": (0, 50)}, max_driver_files=3)
    assert 1 <= len(kept) <= 3 and report["files_total"] == 8
