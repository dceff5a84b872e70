"""Data-quality assertion runner — the dbt-test layer (SURVEY §2.10).

Reference: `unique` + `not_null` on trade_id at bronze source and staging
view (dbt_project/models/staging/schema.yml:11-24), executed after every
pipeline run (binance_dbt_dag.py:38-46, binance_revenue_dag.py:72-79).
Great Expectations is installed-but-unconfigured in the reference
(docker-compose.yml) — this module is the configured version of that
intent: declarative checks, each compiled to an assertion DataFrame that
must be empty.

Each check is a single aggregation/filter — at scale they run as one scan
per table (checks on the same table share the cached scan under AQE reuse).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    name: str
    passed: bool
    violations: int
    sample: list = field(default_factory=list)


def unique(df: DataFrame, col: str) -> DataFrame:
    """Violating keys: count per key > 1 (A4, schema.yml unique test)."""
    return df.groupBy(col).count().where(F.col("count") > 1)


def not_null(df: DataFrame, col: str) -> DataFrame:
    """Violating rows (A5, schema.yml not_null test)."""
    return df.where(F.col(col).isNull()).select(col)


def accepted_range(df: DataFrame, col: str, lo=None, hi=None) -> DataFrame:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return df.where(cond).select(col)


def accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    return df.where(~F.col(col).isin(values) | F.col(col).isNull()).select(col)


def run_checks(
    checks: dict[str, DataFrame], sample_rows: int = 5, fail_fast: bool = False
) -> list[CheckResult]:
    """Evaluate assertion DataFrames; a check passes iff it returns 0 rows —
    exactly dbt's contract. Raises on failure when fail_fast (the DAG gate
    behavior: dbt_run >> dbt_test ordering)."""
    results = []
    for name, assertion in checks.items():
        rows = assertion.limit(sample_rows + 1).collect()
        res = CheckResult(
            name=name,
            passed=not rows,
            violations=len(rows),
            sample=[r.asDict() for r in rows[:sample_rows]],
        )
        results.append(res)
        if fail_fast and not res.passed:
            raise AssertionError(f"quality check failed: {name}: sample={res.sample}")
    return results


def trade_table_checks(df: DataFrame) -> dict[str, DataFrame]:
    """The reference's exact test set for a trade table (schema.yml:11-24)."""
    return {
        "trade_id_unique": unique(df, "trade_id"),
        "trade_id_not_null": not_null(df, "trade_id"),
    }


# ---------------------------------------------------------------------
# Declarative suites — the configured version of the reference's
# installed-but-unconfigured Great Expectations intent (docker-compose.yml
# mounts a GE project dir with no expectations in it). A suite is plain
# data (dict or YAML), compiled to the same assertion-DataFrame contract
# run_checks() already enforces.
# ---------------------------------------------------------------------


def row_count_between(df: DataFrame, lo: int | None = None, hi: int | None = None) -> DataFrame:
    """Table-level expectation: violation row iff the count is out of
    bounds (one count aggregate — metadata-only on parquet scans)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col("n") < lo)
    if hi is not None:
        cond = cond | (F.col("n") > hi)
    return df.agg(F.count(F.lit(1)).alias("n")).where(cond)


_EXPECTATIONS = {
    "unique": unique,
    "not_null": not_null,
    "accepted_range": accepted_range,
    "accepted_values": accepted_values,
}


def compile_suite(df: DataFrame, suite: dict) -> dict[str, DataFrame]:
    """Config → checks. Suite shape (GE-style, engine-agnostic)::

        columns:
          trade_id: [unique, not_null]
          price:    [{accepted_range: {lo: 0}}]
          symbol:   [{accepted_values: {values: [BTCUSDT, ETHUSDT]}}]
        row_count: {min: 1}

    Unknown expectation names fail at compile time (a typo must not
    silently skip a check)."""
    checks: dict[str, DataFrame] = {}
    for col, expectations in (suite.get("columns") or {}).items():
        for exp in expectations:
            if isinstance(exp, str):
                name, kwargs = exp, {}
            elif isinstance(exp, dict) and len(exp) == 1:
                name, kwargs = next(iter(exp.items()))
            else:
                raise ValueError(f"malformed expectation for {col!r}: {exp!r}")
            if name not in _EXPECTATIONS:
                raise ValueError(
                    f"unknown expectation {name!r} for {col!r}; "
                    f"available: {sorted(_EXPECTATIONS)}"
                )
            checks[f"{col}_{name}"] = _EXPECTATIONS[name](df, col, **(kwargs or {}))
    rc = suite.get("row_count")
    if rc:
        checks["row_count"] = row_count_between(df, rc.get("min"), rc.get("max"))
    return checks


def suite_from_yaml(text: str) -> dict:
    """Parse a YAML suite document (see compile_suite for the shape)."""
    import yaml

    loaded = yaml.safe_load(text)
    if not isinstance(loaded, dict):
        raise ValueError("suite YAML must be a mapping")
    return loaded


def run_suite(
    df: DataFrame, suite: dict, sample_rows: int = 5, fail_fast: bool = False
) -> list[CheckResult]:
    """compile + run in one call — the DAG-gate entry point."""
    return run_checks(compile_suite(df, suite), sample_rows, fail_fast)
