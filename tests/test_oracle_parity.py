"""Every oracle-backed query in the catalog must match DuckDB at sf0.001
(fast) — the local mirror of the driver's CORRECTNESS gate. Queries without
oracle SQL are smoke-run (must execute, stable schema)."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL

import sys

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from oracle_harness import compare, duck_connection  # noqa: E402

ALL = queries()
ORACLE = oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_parity(spark, duck, name):
    df = ALL[name](spark, SF_SMALL)
    if name in ORACLE:
        oracle = duck.sql(ORACLE[name]).df()
        errors = compare(df, oracle, name)
        assert not errors, "\n".join(errors)
    else:
        # Spark-only operator: must run and return a well-formed result.
        rows = df.collect()
        assert df.schema is not None
        assert rows is not None


SF_LARGE = "/root/testdata/sf0.1"


@pytest.mark.parametrize("sf", [SF_SMALL, "/root/testdata/sf0.01", SF_LARGE])
def test_bm25_extended_tier_parity(spark, sf):
    """BM25 ranking math vs DuckDB (VERDICT r11 task 3): the extended-tier
    entry (plans/retrieval_tier.py) replays bm25_topk's full one-shot path
    — tokenization, postings, idf, tf saturation, rounded-score top-k —
    in SQL, at all three scale factors. This is retrieval_hybrid's BM25
    leg's first value-level oracle evidence."""
    from binance_data_pipeline_spark.plans import retrieval_tier

    con = duck_connection(sf)
    try:
        df = retrieval_tier.QUERIES["bm25_topk"](spark, sf)
        oracle = con.sql(retrieval_tier.ORACLE["bm25_topk"]).df()
        assert len(oracle) > 0
        errors = compare(df, oracle, f"bm25_topk@{sf}")
        assert not errors, "\n".join(errors)
    finally:
        con.close()


def test_bm25_extended_tier_plan_scale_clean(spark):
    from binance_data_pipeline_spark.plans import retrieval_tier
    from binance_data_pipeline_spark.plans.audit import assert_scale_clean

    assert_scale_clean(retrieval_tier.QUERIES["bm25_topk"](spark, SF_SMALL))


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    assert df.count() > 0


def test_catalog_reentrant(spark):
    """Every catalog callable must be re-runnable in one session — the
    SQL-form queries register temp views (createOrReplaceTempView, not
    createTempView) and nothing may hold single-use state. Counts must
    match across invocations."""
    from binance_data_pipeline_spark.lifecycle import release_barriers

    for name, fn in sorted(ALL.items()):
        a = fn(spark, SF_SMALL).count()
        b = fn(spark, SF_SMALL).count()
        assert a == b, f"{name}: first run {a} rows, second {b}"
        release_barriers(spark)
