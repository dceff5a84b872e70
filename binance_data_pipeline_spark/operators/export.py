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


def export_webdataset(
    df: DataFrame,
    out_path: str,
    id_col: str,
    members: dict[str, str],
    n_shards: int,
    seed: int = 0,
) -> dict:
    """WebDataset-style tar shards — the multimodal training delivery
    format (one tar per shard; each sample contributes members named
    ``<key>.<ext>`` so loaders regroup a sample's modalities by shared
    basename).

    ``members`` maps tar member EXTENSION → source column: binary
    columns write raw bytes (image/audio payloads), strings write UTF-8,
    anything else serializes to compact JSON. NULL member values are
    skipped (a doc without audio simply has no ``.wav`` member).

    Spark shape: the same content-keyed placement as ``export_shards``
    (``pmod(xxhash64(id, seed), n_shards)``) exchanges each shard's rows
    to one ``applyInPandas`` task, which streams a DETERMINISTIC tar
    (members sorted by key; zeroed mtime/uid/gid) straight to
    ``shards/shard-NNNNN.tar`` — tar bytes never pass through the
    driver. The manifest (shard, rows, bytes, path) aggregates the
    per-task summary rows and is written LAST, the family's commit
    marker.

    Paths are opened with plain ``open`` — a POSIX-visible target
    (local dir, NFS/Lustre mount, FUSE-mounted object store). For raw
    S3/HDFS, export to a mount or localize-and-upload; the tar layout
    is loader-standard either way.

    Returns {"n_shards" (requested), "files", "rows", "bytes",
    "manifest_path"}."""
    import os

    if not members:
        raise ValueError("members must map at least one extension to a column")
    missing = [c for c in members.values() if c not in df.columns]
    if missing:
        raise ValueError(f"member columns not in frame: {missing}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be ≥1, got {n_shards}")
    spark = df.sparkSession
    out = out_path.rstrip("/")
    shards_dir = f"{out}/shards"
    os.makedirs(shards_dir, exist_ok=True)

    dtypes = dict(df.dtypes)
    member_specs = [(ext, col, dtypes[col]) for ext, col in sorted(members.items())]
    cols = [id_col] + sorted({c for _, c in members.items()})

    sharded = df.select(*cols).withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards))
    )

    def write_shard(pdf):
        import io
        import json as _json
        import tarfile

        import pandas as pd

        shard = int(pdf["shard"].iloc[0])
        path = os.path.join(shards_dir, f"shard-{shard:05d}.tar")
        pdf = pdf.sort_values(id_col, kind="mergesort")  # deterministic order
        n_bytes = 0
        with open(path, "wb") as fh, tarfile.open(
            fileobj=fh, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for _, row in pdf.iterrows():
                key = str(row[id_col])
                for ext, col, dtype in member_specs:
                    v = row[col]
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    if dtype == "binary":
                        data = bytes(v)
                    elif dtype == "string":
                        data = str(v).encode("utf-8")
                    else:
                        data = _json.dumps(v, separators=(",", ":"), default=str).encode()
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
                    n_bytes += len(data)
        return pd.DataFrame(
            {"shard": [shard], "rows": [len(pdf)], "bytes": [n_bytes], "file": [path]}
        )

    summary = (
        sharded.repartition(n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(write_shard, "shard long, rows long, bytes long, file string")
    )
    summary.coalesce(1).write.mode("overwrite").parquet(f"{out}/manifest.parquet")
    stats = spark.read.parquet(f"{out}/manifest.parquet").agg(
        F.count(F.lit(1)).alias("files"),
        F.sum("rows").alias("rows"),
        F.sum("bytes").alias("bytes"),
    ).first()
    return {
        "n_shards": n_shards,
        "files": int(stats["files"]),
        "rows": int(stats["rows"] or 0),
        "bytes": int(stats["bytes"] or 0),
        "manifest_path": f"{out}/manifest.parquet",
    }


def read_webdataset(
    spark: SparkSession, out_path: str, exts: list[str]
) -> DataFrame:
    """Read an ``export_webdataset`` directory back: one row per sample
    key, one BINARY column per requested extension (decode/cast is the
    caller's — text members are UTF-8 bytes, json members are compact
    JSON bytes). Missing members come back NULL. Refuses a directory
    without a manifest (half-written export), the family convention.

    Scale shape: ``binaryFile`` source loads one tar per task (shards
    are the parallelism unit, same as writing), and the tar walk runs in
    Arrow-batched ``mapInPandas`` — keys within one tar regroup in task
    memory, bounded by shard size."""
    if not exts:
        raise ValueError("exts must name at least one member extension")
    out = out_path.rstrip("/")
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(f"{out}/manifest.parquet").first()
    except AnalysisException:
        raise ValueError(
            f"no manifest at {out} — export incomplete or not an export dir"
        )
    files = spark.read.format("binaryFile").load(f"{out}/shards/shard-*.tar")
    want = list(dict.fromkeys(exts))

    def parse(pdfs):
        import io
        import tarfile

        import pandas as pd

        for pdf in pdfs:
            rows = []
            for content in pdf["content"]:
                groups: dict[str, dict[str, bytes]] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar.getmembers():
                        key, _, ext = m.name.rpartition(".")
                        if ext in want:
                            groups.setdefault(key, {})[ext] = tar.extractfile(m).read()
                for key in sorted(groups):
                    rows.append([key] + [groups[key].get(e) for e in want])
            yield pd.DataFrame(rows, columns=["key"] + want)

    schema = "key string, " + ", ".join(f"{e} binary" for e in want)
    return files.select("content").mapInPandas(parse, schema)


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
