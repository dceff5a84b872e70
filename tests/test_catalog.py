"""Catalog schema-drift guards.

The driver regenerated ``events.parquet`` between rounds with a different
physical ``ts`` encoding (TIMESTAMP(NANOS)-as-INT64 → plain
``timestamp[us]`` NTZ), which broke every events-path query in round 3.
These tests pin ``load_table`` to return the identical canonical schema and
identical row values for every encoding the driver has ever produced, so
the next regeneration cannot silently break the engine again.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from binance_data_pipeline_spark.catalog import load_table, register_testdata

from conftest import SF_SMALL

TS_VALUES = [
    dt.datetime(2024, 1, 1, 0, 0, 0),
    dt.datetime(2024, 1, 1, 12, 30, 45, 123456),
    dt.datetime(2024, 6, 15, 23, 59, 59, 999999),
]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    ts = pa.array(TS_VALUES, type=pa.timestamp("us")).cast(ts_type)
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 20, 30], type=pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], type=pa.float64()),
            "props": pa.array(['{"a":1}', "{}", "{}"]),
        }
    )
    pq.write_table(table, path)


ENCODINGS = {
    # old driver generation: TIMESTAMP(NANOS) physical INT64
    "nanos_int64": pa.timestamp("ns"),
    # current driver generation: plain timestamp[us], no zone (Spark NTZ)
    "us_ntz": pa.timestamp("us"),
    # canonical: timestamp[us] UTC-adjusted (Spark TimestampType)
    "us_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("encoding", sorted(ENCODINGS))
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, encoding):
    """All three historical encodings arrive at the same canonical schema
    and the same wall-clock values."""
    d = tmp_path / encoding
    d.mkdir()
    _write_events(str(d / "events.parquet"), ENCODINGS[encoding])
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r["ts"] for r in df.orderBy("event_id").select("ts").collect()]
    assert got == TS_VALUES


def test_load_table_encodings_agree_pairwise(spark, tmp_path):
    """Identical rows across every encoding — full-row comparison, not just
    the ts column."""
    frames = {}
    for enc, t in ENCODINGS.items():
        d = tmp_path / enc
        d.mkdir()
        _write_events(str(d / "events.parquet"), t)
        frames[enc] = load_table(spark, str(d), "events")
    rows = {enc: df.orderBy("event_id").collect() for enc, df in frames.items()}
    schemas = {enc: df.schema for enc, df in frames.items()}
    base_enc = sorted(ENCODINGS)[0]
    for enc in sorted(ENCODINGS):
        assert schemas[enc] == schemas[base_enc]
        assert rows[enc] == rows[base_enc]


def test_events_view_matches_load_table(spark):
    """register_testdata routes through load_table, so the SQL view and the
    DataFrame path expose the identical schema (VERDICT r3 item 5)."""
    if not os.path.exists(os.path.join(SF_SMALL, "events.parquet")):
        pytest.skip("driver testdata not present")
    register_testdata(spark, SF_SMALL, tables=("events",))
    view_schema = spark.table("events").schema
    df_schema = load_table(spark, SF_SMALL, "events").schema
    assert view_schema == df_schema
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp"
