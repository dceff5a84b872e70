"""Fee/tax rules dimension from CSV (S9).

The reference reads ``rules/fee_tax_rules.csv`` with pandas
(producer/build_fact_fee_tax.py:40-44); the file itself is gitignored, so
the schema is pinned from usage (:55-63): symbol, region, fee_rate_bps,
tax_rate_bps. A ~10-row dimension → always broadcast at join time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import FEE_TAX_RULES_SCHEMA


def read_rules(spark: SparkSession, path: str) -> DataFrame:
    """Explicit schema (no inference — engine rule, SURVEY §1.3)."""
    return (
        spark.read.option("header", "true")
        .schema(FEE_TAX_RULES_SCHEMA)
        .csv(path)
    )


def rules_from_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Inline dimension for tests: (symbol, region, fee_bps, tax_bps)."""
    return spark.createDataFrame(rows, FEE_TAX_RULES_SCHEMA)
