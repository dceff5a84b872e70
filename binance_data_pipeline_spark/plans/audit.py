"""Physical-plan auditor: the codified version of the `.explain` review
every operator in this repo goes through — flags the plan shapes that are
fine at sf0.1 and fatal at 100 TB. Run it in CI (tests/test_plans.py
audits the whole catalog) or ad hoc on a new query before shipping it.

Checks are string-level over the executed plan — deliberately: they
mirror what a reviewer greps for, they're version-stable, and they can't
silently pass by inspecting the wrong tree. Each finding is (severity,
code, message).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    severity: str  # "error" | "warn"
    code: str
    message: str


def plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(df: DataFrame, expect_pushdown: bool = False) -> list[Finding]:
    """Scan a DataFrame's physical plan for 100 TB scale smells:

    - CARTESIAN:    CartesianProduct / BroadcastNestedLoopJoin — O(n·m)
                    row pairing; only acceptable for documented brute-force
                    baselines.
    - PY_ROW_EVAL:  BatchEvalPython — row-at-a-time Python UDF in the
                    plan (Arrow-batched ops show as ArrowEvalPython /
                    MapInPandas / FlatMapGroupsInPandas instead).
    - NO_PUSHDOWN:  (only with expect_pushdown=True) a parquet scan with
                    an empty PushedFilters list while the plan filters
                    rows — the predicate didn't reach the scan.
    - WIDE_SCAN:    a parquet ReadSchema carrying 20+ columns — usually a
                    missing projection before a wide table scan.

    Returns findings, empty when clean. Severity "error" marks shapes
    that must not ship in a hot path; "warn" marks review-worthy ones."""
    text = plan_text(df)
    findings: list[Finding] = []

    if "CartesianProduct" in text:
        findings.append(
            Finding("error", "CARTESIAN", "CartesianProduct in plan — O(n·m) pairing")
        )
    if "BroadcastNestedLoopJoin" in text:
        findings.append(
            Finding(
                "warn",
                "CARTESIAN",
                "BroadcastNestedLoopJoin — non-equi join pairs every row "
                "against the broadcast side",
            )
        )
    if "BatchEvalPython" in text:
        findings.append(
            Finding(
                "error",
                "PY_ROW_EVAL",
                "row-at-a-time Python UDF (BatchEvalPython) — use built-in "
                "functions or an Arrow-batched pandas_udf",
            )
        )

    if expect_pushdown and "Filter" in text:
        for line in text.splitlines():
            if "PushedFilters: []" in line:
                findings.append(
                    Finding(
                        "warn",
                        "NO_PUSHDOWN",
                        "plan filters rows but a parquet scan has no pushed "
                        "filters — predicate did not reach the scan",
                    )
                )
                break

    for line in text.splitlines():
        if "ReadSchema:" in line:
            n_cols = line.count(":") - 1  # struct<a:int,b:string,...>
            if n_cols >= 20:
                findings.append(
                    Finding(
                        "warn",
                        "WIDE_SCAN",
                        f"parquet scan reads {n_cols} columns — project "
                        "before the scan if fewer are used",
                    )
                )
    return findings


def assert_scale_clean(df: DataFrame, allow: set[str] | None = None) -> None:
    """Raise AssertionError on any error-severity finding whose code is
    not in `allow` — the one-liner for tests and CI gates."""
    allow = allow or set()
    errors = [f for f in audit_plan(df) if f.severity == "error" and f.code not in allow]
    if errors:
        raise AssertionError(
            "plan has scale errors: " + "; ".join(f"{f.code}: {f.message}" for f in errors)
        )
