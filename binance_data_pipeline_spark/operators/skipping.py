"""File-level data skipping — a min/max stats index over a parquet
table, consulted BEFORE the scan so unmatching files never enter the
file listing.

Parquet pushdown already skips row groups inside each opened file, but
the planner still lists and opens every file; at 100 TB / ~100k files
the listing+footer round-trips dominate selective queries. Delta and
Iceberg solve this with per-file column stats in the table metadata —
this module is that pattern for plain parquet directories:

  build : one column-pruned scan grouped by ``_metadata.file_path``
          (reads only the stat columns; at write time you'd fold this
          into the writing job — the scan form also covers tables you
          didn't write). Stats are typed min/max/null_count per column.
  prune : evaluate a range predicate against the stats table (tiny) on
          the driver, keep files whose [min, max] intersects; a file
          with NULL stats for a column is kept — unknown must stay
          conservative, never skipped.
  read  : ``spark.read.option("basePath", table).parquet(*kept)`` —
          partition-column derivation survives explicit file lists via
          basePath.

Skipping only pays when values cluster per file: compose with
``scale.zorder_write`` (multi-column locality) or a range-partitioned
write (single column). On random layout every file intersects and the
index degenerates to a no-op — the ``skip_report`` makes that visible
instead of silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def collect_file_stats(
    spark: SparkSession, table_path: str, stat_cols: list[str]
) -> DataFrame:
    """One row per data file: (file, n_rows, {col}_min, {col}_max,
    {col}_nulls) with native column types. Column pruning keeps the
    build scan to exactly ``stat_cols`` + file provenance."""
    df = spark.read.parquet(table_path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
        ]
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *stat_cols)
        .groupBy("file")
        .agg(*aggs)
    )


def build_skipping_index(
    spark: SparkSession, table_path: str, stat_cols: list[str], index_path: str
) -> int:
    """Persist the stats table beside the data; returns file count.
    Rebuild after any write — the index carries no staleness defense of
    its own (pair it with the writer, as compact/zorder jobs do)."""
    stats = collect_file_stats(spark, table_path, stat_cols)
    stats.coalesce(1).write.mode("overwrite").parquet(index_path)
    return spark.read.parquet(index_path).count()


def prune_files(
    stats: DataFrame, predicates: dict[str, tuple], max_driver_files: int = 1_000_000
) -> tuple[list[str], dict]:
    """Files whose stats ranges intersect every predicate range.

    ``predicates`` maps column -> (lo, hi), inclusive, either end None
    for open. A file survives column c unless its whole [min_c, max_c]
    lies outside [lo, hi]; NULL bounds keep the file.

    Driver memory holds only the SURVIVOR paths — the intersection
    filter runs in the plan, pruned-away files never leave the cluster.
    The survivor list itself must land on the driver because
    ``spark.read.parquet(*files)`` takes an explicit listing — the same
    posture as a Delta/Iceberg log read, linear in surviving files, not
    in table files. ``max_driver_files`` caps that materialization with
    a clear error: a predicate that keeps millions of files gains
    nothing from skipping — scan the table with a plain filter instead."""
    keep = F.lit(True)
    for c, (lo, hi) in predicates.items():
        mn, mx = F.col(f"{c}_min"), F.col(f"{c}_max")
        ok = F.lit(True)
        if hi is not None:
            ok = ok & (mn.isNull() | (mn <= F.lit(hi)))
        if lo is not None:
            ok = ok & (mx.isNull() | (mx >= F.lit(lo)))
        keep = keep & ok
    counts = stats.agg(
        F.count(F.lit(1)).alias("total"), F.sum(keep.cast("long")).alias("kept")
    ).first()
    n_total, n_kept = counts["total"], int(counts["kept"] or 0)
    if n_kept > max_driver_files:
        raise ValueError(
            f"predicate keeps {n_kept} files (> max_driver_files="
            f"{max_driver_files}); skipping gains nothing here — read the "
            "table with a plain filter, or raise the cap deliberately"
        )
    kept = [r["file"] for r in stats.where(keep).select("file").collect()]
    report = {"files_total": n_total, "files_kept": n_kept}
    return kept, report


def pruned_read(
    spark: SparkSession,
    table_path: str,
    stats: DataFrame,
    predicates: dict[str, tuple],
) -> tuple[DataFrame, dict]:
    """Read only the files the stats index cannot rule out. The range
    predicates still need to be applied to the result (pruning is
    file-granular); an empty survivor set short-circuits to an empty
    frame with the table's schema."""
    kept, report = prune_files(stats, predicates)
    if not kept:
        empty = spark.read.parquet(table_path).limit(0)
        return empty, report
    df = spark.read.option("basePath", table_path).parquet(*kept)
    return df, report
