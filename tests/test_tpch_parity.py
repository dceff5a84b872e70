"""TPC-H completion tier (plans/tpch.py: Q8, Q11-Q22 shapes) — DuckDB parity
at BOTH sf0.001 and sf0.01 through the same harness the driver's correctness
gate uses, plus the catalog-wide plan-audit bar (no CartesianProduct, no
row-Python, scale-clean shapes). These 13 queries live outside the 50-entry
driver catalog (the driver records exactly 50 rows), so this module IS their
correctness gate."""

from __future__ import annotations

import pytest

from conftest import SF_MED, SF_SMALL

from binance_data_pipeline_spark.plans import tpch
from binance_data_pipeline_spark.plans.audit import assert_scale_clean
from oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck_small():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck_med():
    con = duck_connection(SF_MED)
    yield con
    con.close()


def test_registry_complete():
    assert sorted(tpch.QUERIES) == sorted(tpch.ORACLE)
    assert len(tpch.QUERIES) == 13


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_parity_sf0001(spark, duck_small, name):
    df = tpch.QUERIES[name](spark, SF_SMALL)
    oracle = duck_small.sql(tpch.ORACLE[name]).df()
    assert len(oracle) > 0, f"{name}: oracle empty at sf0.001 — query is vacuous"
    errors = compare(df, oracle, name)
    assert not errors, "\n".join(errors)


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_parity_sf001(spark, duck_med, name):
    df = tpch.QUERIES[name](spark, SF_MED)
    oracle = duck_med.sql(tpch.ORACLE[name]).df()
    assert len(oracle) > 0, f"{name}: oracle empty at sf0.01 — query is vacuous"
    errors = compare(df, oracle, name)
    assert not errors, "\n".join(errors)


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_plan_scale_clean(spark, name):
    """No CartesianProduct / row-Python in any TPC-H plan. The 1-row
    scalar-threshold cross-joins (Q11/Q15/Q22) compile to
    BroadcastNestedLoopJoin against a single-row frame — the audit grades
    those warn, not error, and they are the intended shape."""
    assert_scale_clean(tpch.QUERIES[name](spark, SF_SMALL))


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_q8_broadcasts_all_dims(spark):
    """Q8's part/supplier/nation/region legs must broadcast — the only
    shuffles are the lineitem→orders→customer fact joins + the year agg."""
    plan = _plan(tpch.QUERIES["q8_market_share"](spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastExchange") >= 4, plan
    assert "CartesianProduct" not in plan


def test_q21_aggregate_rewrite_plan(spark):
    """Q21's EXISTS/NOT EXISTS pair lowers as ONE per-order aggregate
    (n_supp >= 2 AND exactly one late supplier, whose identity and
    late-line count ride the same pass) — not the naive three-fact-
    exchange semi/anti plan (the round-8 100x smoke measured that shape
    at 73.5 s / 2.66 GB; the rewrite at 9.9 s / 1.06 GB). Pins: the
    lineitem scan appears exactly ONCE in the physical plan, the
    supplier path broadcasts, and nothing nested-loops over the fact."""
    plan = _plan(tpch.QUERIES["q21_waiting_suppliers"](spark, SF_SMALL))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_scalar_threshold_reenters_as_broadcast(spark):
    """Q11's 0.1%-of-total threshold is a 1-row broadcast nested-loop —
    the intended shape (never a shuffled join, never a driver collect)."""
    plan = _plan(tpch.QUERIES["q11_important_parts"](spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan, plan
