"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship §3.4 revenue query (daily notional →
broadcast dim join → fee/tax arithmetic) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full catalog from
``binance_data_pipeline_spark.plans`` (SURVEY.md §2 coverage + north-star
dedup / similarity / text operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from binance_data_pipeline_spark.plans import all_oracle_sql, all_queries
from binance_data_pipeline_spark.plans.pipeline import q_fact_fee_tax


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_fact_fee_tax(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return all_oracle_sql()
