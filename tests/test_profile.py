"""Table profiler: exact stats cross-checked against DuckDB on the real
events fixture, top-values ordering, numeric quantiles, complex-type
degradation, and edge cases."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import math

import pytest

from binance_data_pipeline_spark.catalog import load_table
from binance_data_pipeline_spark.operators.profile import profile_table

SF = "/root/testdata/sf0.001"


def test_profile_matches_duckdb_on_events(spark):
    import duckdb

    prof = {r["column"]: r for r in profile_table(load_table(spark, SF, "events")).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    n, n_null_val, nd_type, vmin, vmax, vmean = con.execute(
        """
        SELECT count(*),
               count(*) FILTER (WHERE value IS NULL),
               count(DISTINCT event_type),
               min(value), max(value), avg(value)
        FROM events
        """
    ).fetchone()
    ev = prof["value"]
    assert ev["n_rows"] == n
    assert ev["n_nulls"] == n_null_val
    assert float(ev["min_value"]) == vmin
    assert float(ev["max_value"]) == vmax
    assert math.isclose(ev["mean"], vmean, rel_tol=1e-9)
    et = prof["event_type"]
    # HLL estimate on a handful of event types is exact
    assert et["n_distinct_est"] == nd_type
    # top value agrees with the exact mode
    top_type, top_cnt = con.execute(
        "SELECT event_type, count(*) c FROM events GROUP BY 1 ORDER BY c DESC, 1 LIMIT 1"
    ).fetchone()
    assert et["top_values"][0]["value"] == top_type
    assert et["top_values"][0]["count"] == top_cnt


def test_top_values_ranked_and_tie_broken(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",)], "x string"
    )
    (row,) = profile_table(df, top_k=2).collect()
    got = [(t["value"], t["count"]) for t in row["top_values"]]
    assert got == [("a", 2), ("b", 2)]  # count desc, value asc tie-break


def test_quantiles_and_nulls(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)] + [(None,)], "v double"
    )
    (row,) = profile_table(df, quantiles=(0.5,)).collect()
    assert row["n_rows"] == 101 and row["n_nulls"] == 1
    assert abs(row["null_frac"] - 1 / 101) < 1e-12
    assert 49.0 <= row["q50"] <= 52.0
    assert row["stddev"] is not None and row["mean"] == 50.5


def test_complex_types_degrade_to_null_stats(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "id long, emb array<double>"
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    e = prof["emb"]
    assert e["n_nulls"] == 1 and e["dtype"] == "array<double>"
    assert e["min_value"] is None and e["top_values"] == []


def test_empty_table_and_validation(spark):
    df = spark.createDataFrame([], "x string, y double")
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["x"]["n_rows"] == 0 and prof["x"]["null_frac"] is None
    with pytest.raises(ValueError, match="top_k"):
        profile_table(df, top_k=-1)


def test_cli_profile(spark, tmp_path, capsys):
    from binance_data_pipeline_spark.__main__ import main

    src = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None)], "k string, v double"
    ).write.parquet(src)
    out = str(tmp_path / "prof.parquet")
    assert main(["profile", "--table", src, "--out", out]) == 0
    printed = capsys.readouterr().out
    assert "k\tstring" in printed and "nulls=1/3" in printed
    assert spark.read.parquet(out).count() == 2
