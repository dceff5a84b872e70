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
