"""Training-data export — evenly sized shards plus a manifest, the
hand-off format a tokenizer/loader fleet consumes.

A trainer's data loader wants (a) shards of roughly equal size so
data-parallel workers finish together, (b) a deterministic doc→shard
placement so re-exports are reproducible, and (c) a manifest it can
read WITHOUT listing the object store. A plain ``df.write`` gives none
of those: file sizes follow upstream partitioning, and the only
"manifest" is a directory listing.

Spark shape: shard id = ``pmod(xxhash64(id, seed), n_shards)`` — one
hash-partition exchange to exactly ``n_shards`` writer tasks, one file
per shard (jsonl or parquet). The manifest derives from a second,
metadata-cheap pass over the written files (`_metadata.file_path` scan
grouped per file) and is written LAST — a manifest whose shards aren't
fully on disk can never exist, so readers treat "manifest present" as
the commit marker (same convention as the IVF index's meta.parquet).

At 100 TB: the exchange is the unavoidable placement shuffle (the
trainer's locality requirement, not overhead); writers stream rows out
without per-row Python. Choose ``n_shards`` ≈ total_bytes / shard_target
(e.g. 256 MB) — at 32 shards/task-slot granularity the writers saturate;
the manifest pass reads footers/row-groups, not the data columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_shards(
    df: DataFrame,
    out_path: str,
    id_col: str,
    n_shards: int,
    fmt: str = "jsonl",
    seed: int = 0,
    compression: str | None = None,
) -> dict:
    """Write ``df`` as exactly ``n_shards`` deterministic shards under
    ``out_path/shards`` plus ``out_path/manifest.parquet`` (file, rows;
    written last = commit marker). ``fmt`` ∈ {"jsonl", "parquet"}.

    Placement is content-keyed: same (id, seed, n_shards) → same shard
    for every row across re-runs and cluster sizes. Shards are hive
    dirs ``shards/shard=N`` holding ONE file each (the pre-write
    repartition puts a shard's rows in exactly one task); a shard with
    no rows gets no dir, so ``files ≤ n_shards`` when rows < shards.
    ``compression`` (e.g. "gzip" for the conventional jsonl.gz delivery,
    "zstd"/"snappy" for parquet) applies per shard file; Spark reads the
    compressed shards back transparently.
    Returns {"n_shards" (requested), "files", "rows", "manifest_path"}."""
    if fmt not in ("jsonl", "parquet"):
        raise ValueError(f"fmt must be jsonl or parquet, got {fmt!r}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be ≥1, got {n_shards}")
    spark = df.sparkSession
    out = out_path.rstrip("/")
    shards_path = f"{out}/shards"

    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards))
    ).repartition(n_shards, "shard")
    writer = sharded.write.mode("overwrite").partitionBy("shard")
    if compression is not None:
        writer = writer.option("compression", compression)
    if fmt == "jsonl":
        writer.json(shards_path)  # one JSON object per line
    else:
        writer.parquet(shards_path)

    reader = spark.read.json(shards_path) if fmt == "jsonl" else spark.read.parquet(shards_path)
    manifest = (
        reader.select(F.col("_metadata.file_path").alias("file"), "shard")
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("rows"), F.first("shard").alias("shard"))
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{out}/manifest.parquet")
    stats = spark.read.parquet(f"{out}/manifest.parquet").agg(
        F.count(F.lit(1)).alias("files"), F.sum("rows").alias("rows")
    ).first()
    return {
        "n_shards": n_shards,
        "files": int(stats["files"]),
        "rows": int(stats["rows"] or 0),
        "manifest_path": f"{out}/manifest.parquet",
    }


def read_export(spark: SparkSession, out_path: str, fmt: str = "jsonl") -> DataFrame:
    """Read an export back, refusing a shard directory with no manifest
    (half-written export)."""
    out = out_path.rstrip("/")
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(f"{out}/manifest.parquet").first()
    except AnalysisException:
        raise ValueError(
            f"no manifest at {out} — export incomplete or not an export dir"
        )
    shards = f"{out}/shards"
    return spark.read.json(shards) if fmt == "jsonl" else spark.read.parquet(shards)
