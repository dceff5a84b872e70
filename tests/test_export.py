"""Shard export: deterministic content-keyed placement, one file per
shard, a manifest written last that gates reads, and jsonl/parquet
round-trips that preserve every row."""

from __future__ import annotations

import glob
import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.export import export_shards, read_export


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text-"), F.col("id")).alias("text")
    )


def test_export_shard_layout_and_manifest(spark, tmp_path):
    out = str(tmp_path / "exp")
    stats = export_shards(_docs(spark), out, "doc_id", n_shards=8)
    assert stats["n_shards"] == 8 and stats["files"] == 8 and stats["rows"] == 500
    # one file per shard dir
    for d in glob.glob(f"{out}/shards/shard=*"):
        assert len(glob.glob(f"{d}/part-*")) == 1
    manifest = spark.read.parquet(f"{out}/manifest.parquet").collect()
    assert len(manifest) == 8
    assert sum(r["rows"] for r in manifest) == 500
    assert sorted(r["shard"] for r in manifest) == list(range(8))


def test_export_roundtrip_and_determinism(spark, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_shards(_docs(spark), out1, "doc_id", n_shards=4, seed=9)
    export_shards(_docs(spark).repartition(13), out2, "doc_id", n_shards=4, seed=9)
    a = read_export(spark, out1).select("doc_id", "shard")
    b = read_export(spark, out2).select("doc_id", "shard").withColumnRenamed("shard", "s2")
    # same (id, seed) → same shard regardless of input partitioning
    assert a.join(b, "doc_id").where(F.col("shard") != F.col("s2")).count() == 0
    assert a.count() == 500
    texts = {r["doc_id"]: r["text"] for r in read_export(spark, out1).collect()}
    assert texts[7] == "text-7"


def test_export_parquet_format(spark, tmp_path):
    out = str(tmp_path / "p")
    stats = export_shards(_docs(spark, 100), out, "doc_id", n_shards=3, fmt="parquet")
    assert stats["rows"] == 100
    back = read_export(spark, out, fmt="parquet")
    assert back.count() == 100 and "text" in back.columns


def test_read_refuses_manifestless_dir(spark, tmp_path):
    out = str(tmp_path / "half")
    _docs(spark, 10).write.json(f"{out}/shards")  # shards but no manifest
    with pytest.raises(ValueError, match="no manifest"):
        read_export(spark, out)


def test_export_validates_args(spark, tmp_path):
    with pytest.raises(ValueError, match="fmt"):
        export_shards(_docs(spark, 5), str(tmp_path / "x"), "doc_id", 2, fmt="csv")
    with pytest.raises(ValueError, match="n_shards"):
        export_shards(_docs(spark, 5), str(tmp_path / "y"), "doc_id", 0)


def test_empty_shards_allowed(spark, tmp_path):
    out = str(tmp_path / "few")
    stats = export_shards(_docs(spark, 2), out, "doc_id", n_shards=16)
    assert stats["files"] <= 16 and stats["rows"] == 2


def test_export_jsonl_gzip_roundtrip(spark, tmp_path):
    """jsonl.gz delivery: per-shard gzip files, transparently re-read,
    manifest row counts unchanged by compression."""
    import glob

    from binance_data_pipeline_spark.operators.export import export_shards, read_export

    out = str(tmp_path / "exp")
    df = spark.createDataFrame(
        [(i, f"doc {i} body") for i in range(200)], "doc_id long, text string"
    )
    stats = export_shards(df, out, "doc_id", n_shards=4, fmt="jsonl", compression="gzip")
    assert stats["rows"] == 200
    gz = glob.glob(f"{out}/shards/shard=*/*.gz")
    assert gz, "expected .gz shard files"
    back = read_export(spark, out, fmt="jsonl")
    assert back.count() == 200
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == set(range(200))
