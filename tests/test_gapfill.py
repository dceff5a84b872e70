"""Gap-fill: dense grid covers exactly [min, max] per group (or the
pinned axis), LOCF carries the last observation, interpolation is exact
on linear series and NULL outside the bracketing observations, and the
plan stays one join + one window (no cartesian, no collect)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest

from binance_data_pipeline_spark.operators.gapfill import dense_grid, gapfill


def _series(spark):
    # Group "a": observations at t=0,30,60 (price 10 -> 16 -> 10);
    # group "b": single observation at t=10.
    rows = [
        ("a", 0, 10.0, 1.0),
        ("a", 30, 16.0, None),
        ("a", 60, 10.0, 3.0),
        ("b", 10, 5.0, 7.0),
    ]
    return spark.createDataFrame(rows, "sym string, bucket long, price double, vol double")


def test_dense_grid_per_group_bounds(spark):
    got = dense_grid(_series(spark), "bucket", 10, ["sym"]).collect()
    by_sym = {}
    for r in got:
        by_sym.setdefault(r["sym"], []).append(r["bucket"])
    assert sorted(by_sym["a"]) == [0, 10, 20, 30, 40, 50, 60]
    assert by_sym["b"] == [10]


def test_dense_grid_pinned_axis_clips(spark):
    got = dense_grid(_series(spark), "bucket", 10, ["sym"], start=20, end=50).collect()
    buckets = {(r["sym"], r["bucket"]) for r in got}
    assert buckets == {("a", b) for b in (20, 30, 40, 50)} | {
        ("b", b) for b in (20, 30, 40, 50)
    }


def test_locf_and_interpolate_values(spark):
    out = gapfill(
        _series(spark),
        "bucket",
        10,
        {"price": "interpolate", "vol": "locf"},
        ["sym"],
    )
    rows = {(r["sym"], r["bucket"]): r for r in out.collect()}
    a = [rows[("a", b)] for b in (0, 10, 20, 30, 40, 50, 60)]

    # interpolate: exact linear blend between (0,10) (30,16) (60,10)
    assert [r["price"] for r in a] == [10.0, 12.0, 14.0, 16.0, 14.0, 12.0, 10.0]
    # locf: vol observed at 0 (1.0), NULL at 30 is carried over, 3.0 at 60
    assert [r["vol"] for r in a] == [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 3.0]
    assert [r["is_gap"] for r in a] == [False, True, True, False, True, True, False]


def test_interpolate_edges_stay_null(spark):
    # vol has observations only at a:0 and a:60 -> interpolating vol is
    # defined on [0,60]; price observed everywhere. Pin the axis wider
    # than the data: rows outside the observed bracket must stay NULL.
    out = gapfill(
        _series(spark).filter("sym = 'a'"),
        "bucket",
        10,
        {"vol": "interpolate"},
        ["sym"],
        start=-20,
        end=80,
    )
    rows = {r["bucket"]: r["vol"] for r in out.collect()}
    assert rows[-20] is None and rows[-10] is None  # before first obs
    assert rows[70] is None and rows[80] is None  # after last obs
    assert rows[0] == 1.0 and rows[60] == 3.0
    assert rows[30] == pytest.approx(2.0)  # (0,1.0)..(60,3.0) midpoint


def test_null_strategy_densifies_only(spark):
    out = gapfill(_series(spark), "bucket", 10, {"price": "null"}, ["sym"])
    rows = {(r["sym"], r["bucket"]): r["price"] for r in out.collect()}
    assert rows[("a", 0)] == 10.0 and rows[("a", 10)] is None


def test_unknown_strategy_rejected(spark):
    with pytest.raises(ValueError, match="unknown fill strategy"):
        gapfill(_series(spark), "bucket", 10, {"price": "ffill"}, ["sym"])


def test_plan_is_join_plus_window(spark):
    out = gapfill(
        _series(spark), "bucket", 10, {"price": "interpolate", "vol": "locf"}, ["sym"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # interpolate + locf over the same (group, order) resolve to shared
    # window specs, not one shuffle per filled column
    assert plan.count("Window") <= 2
