"""Bloom-prefiltered joins: superset contract, exact-join equality,
actual row reduction, empty/validation edges, JVM-only plan."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.bloomjoin import (
    bloom_join,
    bloom_prefilter,
)


def _big(spark, n=10_000):
    return spark.range(0, n).selectExpr("id as k", "id * 2 as payload")


def _keys(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id as k")


def test_prefilter_is_a_superset_and_reduces_rows(spark):
    big, keys = _big(spark), _keys(spark, 0, 100)  # 1% selective
    pre = bloom_prefilter(big, keys, "k", fpp=0.01)
    kept = {r["k"] for r in pre.collect()}
    assert set(range(100)) <= kept            # no true match ever dropped
    assert len(kept) < 100 + 0.05 * 10_000    # ~1% fp over 9 900 non-matches


def test_bloom_join_equals_plain_join(spark):
    big, keys = _big(spark), _keys(spark, 50, 250)
    got = sorted(
        (r["k"], r["payload"]) for r in bloom_join(big, keys, "k").collect()
    )
    want = sorted((r["k"], r["payload"]) for r in big.join(keys, "k").collect())
    assert got == want
    # semi form too
    got_semi = sorted(r["k"] for r in bloom_join(big, keys, "k", how="left_semi").collect())
    want_semi = sorted(r["k"] for r in big.join(keys, "k", "left_semi").collect())
    assert got_semi == want_semi


def test_expected_items_skips_the_count_pass(spark):
    big, keys = _big(spark), _keys(spark, 0, 100)
    pre = bloom_prefilter(big, keys, "k", expected_items=100)
    assert {r["k"] for r in pre.collect()} >= set(range(100))


def test_empty_keys_side_yields_empty_superset(spark):
    big = _big(spark)
    empty = _keys(spark, 0, 0)
    assert bloom_prefilter(big, empty, "k").count() == 0
    assert bloom_join(big, empty, "k").count() == 0


def test_validation(spark):
    big, keys = _big(spark, 10), _keys(spark, 0, 5)
    with pytest.raises(ValueError, match="fpp"):
        bloom_prefilter(big, keys, "k", fpp=1.5)
    with pytest.raises(ValueError, match="drop big-side rows"):
        bloom_join(big, keys, "k", how="left")
    with pytest.raises(ValueError, match="single key"):
        bloom_join(big, keys, ["a", "b"])


def test_plan_is_jvm_only_broadcast(spark):
    big, keys = _big(spark), _keys(spark, 0, 100)
    pre = bloom_prefilter(big, keys, "k", expected_items=100)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the bits ride a 1-row broadcast; the big side is never shuffled —
    # the only hash exchanges allowed are the bitmap build's own
    # (partitioned on its word column `w`)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    total_ex = plan.count("Exchange hashpartitioning")
    build_ex = plan.count("Exchange hashpartitioning(w#")
    assert total_ex == build_ex, plan
