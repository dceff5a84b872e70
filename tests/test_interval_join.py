"""Interval join: the bucketed rewrite is result-identical to the
literal theta join (the oracle) across widths, plans as an equi-join
instead of a nested loop, handles timestamps and extra equi keys, and
fails loudly on pathological interval/width combinations."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.interval_join import (
    interval_join,
    interval_join_naive,
    suggest_bucket_width,
)


def _fixtures(spark, n_events=500, n_intervals=40, seed=7):
    import random

    rnd = random.Random(seed)
    ev = [(i, rnd.randint(0, 10_000), f"s{rnd.randint(0, 3)}") for i in range(n_events)]
    iv = []
    for j in range(n_intervals):
        s = rnd.randint(0, 9_500)
        iv.append((j, s, s + rnd.randint(0, 800), f"s{rnd.randint(0, 3)}"))
    events = spark.createDataFrame(ev, "event_id long, ts long, sym string")
    intervals = spark.createDataFrame(iv, "ivl_id long, start long, end long, sym string")
    return events, intervals


def _pairs(df):
    return sorted((r["event_id"], r["ivl_id"]) for r in df.collect())


def test_bucketed_matches_naive_across_widths(spark):
    events, intervals = _fixtures(spark)
    oracle = _pairs(interval_join_naive(events, intervals))
    assert len(oracle) > 100  # non-vacuous overlap
    for w in (1, 37, 400, 5_000):
        got = _pairs(interval_join(events, intervals, width=w))
        assert got == oracle, f"width={w}"


def test_extra_equi_keys_and_left_join(spark):
    events, intervals = _fixtures(spark)
    oracle = _pairs(interval_join_naive(events, intervals, on=["sym"]))
    got = _pairs(interval_join(events, intervals, width=200, on=["sym"]))
    assert got == oracle and len(got) < len(_pairs(interval_join(events, intervals, width=200)))

    left = interval_join(events, intervals, width=200, on=["sym"], how="left")
    rows = left.collect()
    matched = [r for r in rows if r["ivl_id"] is not None]
    unmatched = [r for r in rows if r["ivl_id"] is None]
    assert sorted((r["event_id"], r["ivl_id"]) for r in matched) == oracle
    # every event appears: matched ones per overlap, others exactly once
    assert {r["event_id"] for r in rows} == {r["event_id"] for r in events.collect()}
    assert len(unmatched) == events.count() - len({e for e, _ in oracle})


def test_timestamp_columns(spark):
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05"), (2, "2024-01-01 00:01:30")],
        "event_id long, ts string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"))
    intervals = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 00:01:00")],
        "ivl_id long, start string, end string",
    ).select(
        "ivl_id",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    got = _pairs(interval_join(events, intervals, width=60_000_000))
    assert got == [(1, 10)]


def test_plans_equi_join_not_nested_loop(spark):
    events, intervals = _fixtures(spark)
    scale = interval_join(events, intervals, width=200)
    plan = scale._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan

    naive = interval_join_naive(events, intervals)
    nplan = naive._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in nplan or "Cartesian" in nplan  # the documented baseline


def test_suggest_bucket_width_median(spark):
    _, intervals = _fixtures(spark)
    w = suggest_bucket_width(intervals)
    lens = sorted(r["end"] - r["start"] for r in intervals.collect())
    assert abs(w - lens[len(lens) // 2]) <= max(0.1 * lens[-1], 2)


def test_runaway_span_guard(spark):
    events = spark.createDataFrame([(1, 5)], "event_id long, ts long")
    intervals = spark.createDataFrame(
        [(1, 0, 100_000_000_000)], "ivl_id long, start long, end long"
    )
    with pytest.raises(Exception, match="raise width"):
        interval_join(events, intervals, width=1).collect()
    with pytest.raises(ValueError, match="positive"):
        interval_join(events, intervals, width=0)
    with pytest.raises(ValueError, match="how"):
        interval_join(events, intervals, width=10, how="full")


def test_inverted_intervals_dropped(spark):
    events = spark.createDataFrame([(1, 5)], "event_id long, ts long")
    intervals = spark.createDataFrame(
        [(1, 10, 0), (2, 0, 10)], "ivl_id long, start long, end long"
    )
    assert _pairs(interval_join(events, intervals, width=4)) == [(1, 2)]
