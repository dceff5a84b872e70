"""Custom streaming sinks via foreachBatch.

dual_write: the reference's dual-sink pattern — every batch lands in BOTH
the lake path (S3 parquet) and the warehouse table (BigQuery append)
(airflow/dags/ingest_binance_last_3_days.py:65-103 does this for batch;
the streaming consumer writes only S3). foreachBatch gives the engine-side
equivalent: one micro-batch, two writes, driven by the same checkpoint.

Fidelity note: the reference swallows per-sink errors independently
(`:82-83,102-103`), which can diverge the two copies. We do the OPPOSITE by
default (fail the batch → checkpoint retries both writes) because divergent
copies are the worse failure mode; `best_effort=True` restores reference
behavior and documents the trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def dual_write_stream(
    stream_df: DataFrame,
    lake_path: str,
    warehouse_table: str,
    checkpoint_path: str,
    partition_cols: list[str] | None = None,
    best_effort: bool = False,
    available_now: bool = False,
    trigger_interval: str = "5 seconds",
) -> StreamingQuery:
    """Start a dual-sink query: parquet lake path + catalog table append."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        def lake() -> None:
            w = batch_df.write.mode("append")
            if partition_cols:
                w = w.partitionBy(*partition_cols)
            w.parquet(lake_path)

        def warehouse() -> None:
            batch_df.write.mode("append").format("parquet").saveAsTable(warehouse_table)

        if best_effort:
            for sink in (lake, warehouse):
                try:
                    sink()
                except Exception:
                    pass  # reference parity: print-and-continue per sink
        else:
            lake()
            warehouse()

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
