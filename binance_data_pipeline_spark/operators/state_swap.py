"""Exactly-once mergeable-state maintenance for foreachBatch sinks.

Append-only streaming states (incremental_dedup, semdedup) are naturally
replay-idempotent: a re-delivered batch re-drops against state it already
wrote. MERGE states (sketch rollups: quantiles, heavy hitters) are not —
re-merging a replayed batch double-counts. The standard Structured
Streaming recipe for an idempotent sink is to commit the foreachBatch
``batch_id`` transactionally with the data; this module packages that
recipe for directory-swapped parquet state:

    {state_path}/table.parquet   the merged summary rows
    {state_path}/meta.parquet    (last_batch_id)

Both land in a temp directory and move into place with ONE Hadoop-FS
rename (the ivf.py build pattern — scheme-agnostic, atomic on HDFS-like
stores), so data and applied-batch-id can never disagree. A replayed
batch sees its id already committed and returns without touching state;
a crash mid-swap leaves the previous state intact and the checkpoint
re-runs the batch.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException

from .ivf import _hadoop_fs

__all__ = ["merge_state_batch", "read_state"]


def merge_state_batch(
    spark: SparkSession,
    state_path: str,
    build_batch_rows: Callable[[], DataFrame],
    merge_rows: Callable[[DataFrame], DataFrame],
    batch_id: int | None = None,
) -> None:
    """Fold one batch into the persisted state at ``state_path``.

    ``build_batch_rows()`` produces this batch's summary rows (called
    only when the batch is not a replay); ``merge_rows(union)`` collapses
    the union of prior-state rows and batch rows back to one row per
    group. ``batch_id`` enables the exactly-once replay guard; None
    disables it (ad-hoc batch use)."""
    state = state_path.rstrip("/")
    prior = None
    try:
        meta = spark.read.parquet(f"{state}/meta.parquet").first()
        if (
            batch_id is not None
            and meta is not None
            and meta["last_batch_id"] is not None
            and batch_id <= meta["last_batch_id"]
        ):
            return  # replayed batch: already folded into state
        prior = spark.read.parquet(f"{state}/table.parquet")
    except AnalysisException:
        prior = None

    batch_rows = build_batch_rows()
    merged = (
        merge_rows(prior.unionByName(batch_rows)) if prior is not None else batch_rows
    )

    tmp = f"{state}__swap_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(f"{tmp}/table.parquet")
    spark.createDataFrame(
        [(batch_id if batch_id is not None else -1,)], "last_batch_id long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/meta.parquet")
    fs, dest = _hadoop_fs(spark, state)
    _, tmp_p = _hadoop_fs(spark, tmp)
    if fs.exists(dest):
        fs.delete(dest, True)
    if not fs.rename(tmp_p, dest):
        fs.delete(tmp_p, True)
        raise RuntimeError(f"merge state at {state} was concurrently replaced")


def read_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The current merged state table."""
    return spark.read.parquet(f"{state_path.rstrip('/')}/table.parquet")
