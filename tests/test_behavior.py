"""Funnel + cohort retention: hand-built ordering cases, the within
window, offset-0 invariant, and DuckDB cross-checks on the real events
fixture."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import datetime as dt

import pytest

from binance_data_pipeline_spark.catalog import load_table
from binance_data_pipeline_spark.operators.behavior import (
    cohort_retention,
    funnel_conversion,
)

SF = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), e) for u, d, h, e in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_requires_order(spark):
    rows = [
        (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "buy"),   # full path
        (2, 1, 5, "click"), (2, 1, 6, "view"),                      # click BEFORE view
        (3, 2, 1, "view"), (3, 2, 2, "click"),                      # stops at click
        (4, 3, 1, "buy"),                                           # never entered
    ]
    out = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(_ev(spark, rows), ["view", "click", "buy"]).collect()
    }
    assert out == {"view": 3, "click": 2, "buy": 1}


def test_funnel_within_window(spark):
    rows = [
        (1, 1, 1, "view"), (1, 1, 2, "click"),    # 1h after entry
        (2, 1, 1, "view"), (2, 2, 12, "click"),   # 35h after entry
    ]
    ev = _ev(spark, rows)
    loose = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(ev, ["view", "click"]).collect()
    }
    tight = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(ev, ["view", "click"], within_seconds=7200).collect()
    }
    assert loose["click"] == 2 and tight["click"] == 1
    with pytest.raises(ValueError, match="2 steps"):
        funnel_conversion(ev, ["view"])


def test_funnel_matches_duckdb_on_fixture(spark):
    import duckdb

    ev = load_table(spark, SF, "events")
    got = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(ev, ["view", "click", "purchase"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    s1, s2, s3 = con.execute(
        """
        WITH s1 AS (SELECT user_id u, min(ts) t1 FROM events
                    WHERE event_type='view' GROUP BY 1),
        s2 AS (SELECT e.user_id u, min(e.ts) t2 FROM events e
               JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t1
               WHERE e.event_type='click' GROUP BY 1),
        s3 AS (SELECT e.user_id u, min(e.ts) t3 FROM events e
               JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t2
               WHERE e.event_type='purchase' GROUP BY 1)
        SELECT (SELECT count(*) FROM s1), (SELECT count(*) FROM s2),
               (SELECT count(*) FROM s3)
        """
    ).fetchone()
    assert (got["view"], got["click"], got["purchase"]) == (s1, s2, s3)


def test_cohort_offset_zero_is_full_retention(spark):
    ev = load_table(spark, SF, "events")
    rows = cohort_retention(ev, period="week", max_offset=4).collect()
    assert rows, "fixture produced no cohorts"
    for r in rows:
        if r["period_offset"] == 0:
            assert r["retention"] == 1.0
        assert 0 < r["n_active"] <= r["n_cohort"]


def test_cohort_matches_duckdb_on_fixture(spark):
    import duckdb

    ev = load_table(spark, SF, "events")
    got = {
        (str(r["cohort"])[:10], r["period_offset"]): (r["n_active"], r["n_cohort"])
        for r in cohort_retention(ev, period="week").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    oracle = {}
    for cb, k, n_active, n_cohort in con.execute(
        """
        WITH f AS (SELECT user_id u, min(ts) t0 FROM events GROUP BY 1),
        sizes AS (SELECT date_trunc('week', t0) cb, count(*) n FROM f GROUP BY 1),
        a AS (SELECT DISTINCT e.user_id u, date_trunc('week', f.t0) cb,
                     cast(date_diff('day', cast(date_trunc('week', f.t0) as date),
                          cast(date_trunc('week', e.ts) as date)) / 7 as int) k
              FROM events e JOIN f ON e.user_id = f.u)
        SELECT a.cb, a.k, count(*), any_value(sizes.n)
        FROM a JOIN sizes ON a.cb = sizes.cb GROUP BY 1, 2
        """
    ).fetchall():
        oracle[(str(cb)[:10], k)] = (n_active, n_cohort)
    assert got == oracle
    with pytest.raises(ValueError, match="period"):
        cohort_retention(ev, period="fortnight")
