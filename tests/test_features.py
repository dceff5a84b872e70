"""Feature engineering fit/transform: DuckDB cross-checks for scaling
and target encoding, leakage discipline (train stats applied to val),
binning calibration, one-hot schema stability."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import math

import pytest

from binance_data_pipeline_spark.operators.features import (
    apply_minmax_scaler,
    apply_one_hot,
    apply_quantile_bins,
    apply_standard_scaler,
    apply_target_encoding,
    fit_minmax_scaler,
    fit_one_hot,
    fit_quantile_bins,
    fit_standard_scaler,
    fit_target_encoding,
)

SF = "/root/testdata/sf0.001"


def test_standard_scaler_matches_duckdb(spark):
    import duckdb

    from binance_data_pipeline_spark.catalog import load_table

    ev = load_table(spark, SF, "events")
    stats = fit_standard_scaler(ev, ["value"])
    got = {
        r["event_id"]: r["value_z"]
        for r in apply_standard_scaler(ev, stats, ["value"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    for eid, z in con.execute(
        """
        SELECT event_id,
               (value - (SELECT avg(value) FROM events))
               / (SELECT stddev_samp(value) FROM events)
        FROM events
        """
    ).fetchall():
        if z is None:
            assert got[eid] is None
        else:
            assert math.isclose(got[eid], z, rel_tol=1e-9), (eid, got[eid], z)


def test_scalers_use_train_stats_on_validation(spark):
    train = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    val = spark.createDataFrame([(20.0,)], "x double")  # outside train range
    mm = fit_minmax_scaler(train, ["x"])
    (r,) = apply_minmax_scaler(val, mm, ["x"]).collect()
    assert r["x_01"] == 2.0  # shift visible, not clipped
    ss = fit_standard_scaler(train, ["x"])
    (r,) = apply_standard_scaler(val, ss, ["x"]).collect()
    # train mean 5, std ~7.071 -> z ~ 2.1213
    assert abs(r["x_z"] - (20.0 - 5.0) / math.sqrt(50.0)) < 1e-12


def test_constant_column_yields_null_not_fake(spark):
    df = spark.createDataFrame([(3.0,), (3.0,)], "x double")
    (r,) = apply_standard_scaler(df.limit(1), fit_standard_scaler(df, ["x"]), ["x"]).collect()
    assert r["x_z"] is None
    (r,) = apply_minmax_scaler(df.limit(1), fit_minmax_scaler(df, ["x"]), ["x"]).collect()
    assert r["x_01"] is None


def test_quantile_bins_are_equal_mass_and_order_preserving(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1000)], "x double")
    cuts = fit_quantile_bins(df, "x", n_bins=4)
    assert len(cuts) == 3 and cuts == sorted(cuts)
    from pyspark.sql import functions as F

    binned = apply_quantile_bins(df, "x", cuts)
    sizes = {r["x_bin"]: r["n"] for r in binned.groupBy("x_bin").agg(
        F.count("*").alias("n")
    ).collect()}
    assert set(sizes) == {0, 1, 2, 3}
    for b, n in sizes.items():
        assert 200 <= n <= 300, sizes  # ~250 each
    # NULL in, NULL out
    dfn = spark.createDataFrame([(None,)], "x double")
    assert apply_quantile_bins(dfn, "x", cuts).first()["x_bin"] is None
    with pytest.raises(ValueError, match="n_bins"):
        fit_quantile_bins(df, "x", 1)


def test_one_hot_fixed_schema_and_other_bucket(spark):
    train = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",)], "k string"
    )
    cats = fit_one_hot(train, "k", top_k=2)
    assert cats == ["a", "b"]  # count desc, value asc
    val = spark.createDataFrame([("a",), ("z",), (None,)], "k string")
    rows = apply_one_hot(val, "k", cats).collect()
    assert set(rows[0].asDict()) == {"k", "k__a", "k__b", "k__other"}
    byk = {r["k"]: r for r in rows}
    assert (byk["a"]["k__a"], byk["a"]["k__other"]) == (1, 0)
    assert (byk["z"]["k__a"], byk["z"]["k__other"]) == (0, 1)
    assert byk[None]["k__other"] == 0  # NULL is absence, not "other"


def test_target_encoding_smoothing_and_unseen(spark):
    import duckdb

    train = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 0.0), ("b", 1.0)], "k string, y double"
    )
    enc = fit_target_encoding(train, "k", "y", smoothing=2.0)
    got = {r["category"]: r["encoding"] for r in enc.collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            """
            WITH g AS (SELECT avg(y) m FROM (VALUES ('a',1.0),('a',1.0),('a',0.0),('b',1.0)) t(k,y)),
            c AS (SELECT k, count(*) n, avg(y) m FROM (VALUES ('a',1.0),('a',1.0),('a',0.0),('b',1.0)) t(k,y) GROUP BY k)
            SELECT c.k, (c.n*c.m + 2.0*g.m)/(c.n + 2.0) FROM c, g
            """
        ).fetchall()
    )
    for k in ("a", "b"):
        assert math.isclose(got[k], want[k], rel_tol=1e-12)
    # rare category sits closer to the global mean than its raw mean
    assert abs(got["b"] - 0.75) < abs(1.0 - 0.75)

    val = spark.createDataFrame([("a",), ("zz",)], "k string")
    out = {r["k"]: r["k_te"] for r in apply_target_encoding(val, "k", enc).collect()}
    assert math.isclose(out["a"], got["a"], rel_tol=1e-12)
    assert out["zz"] is None  # unseen visible as NULL
    out2 = {r["k"]: r["k_te"] for r in
            apply_target_encoding(val, "k", enc, default=0.75).collect()}
    assert out2["zz"] == 0.75

    plan = apply_target_encoding(val, "k", enc)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
