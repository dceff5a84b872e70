"""Relational subquery filters as DataFrame compositions with exact ANSI
three-valued-logic semantics.

Spark SQL text supports `IN (subquery)` / `NOT IN` / `EXISTS` natively
(Catalyst plans a null-aware anti join for NOT IN), but the DataFrame
API has no subquery expression — users composing plans programmatically
end up hand-rolling `left_anti` joins that silently get the NULL cases
wrong. `NOT IN` is the classic trap: one NULL in the subquery result
makes the whole predicate never-TRUE, and a NULL probe value is UNKNOWN
(filtered) whenever the subquery is non-empty — a bare anti join gets
both wrong (it keeps NULL-probe rows and ignores inner NULLs entirely).

These helpers encode the full truth table:

    x IN (S):      TRUE  iff some s in S has x = s        -> keep
                   never TRUE when x is NULL or s is NULL
    x NOT IN (S):  S empty            -> TRUE for every x (even NULL)
                   S contains NULL    -> never TRUE (no row survives)
                   else               -> TRUE iff x not NULL and x not in S
    EXISTS (corr): TRUE iff the correlated inner has a row; NULL
                   correlation keys never match (equality 3VL)

`not_in_filter` decides the S-empty / S-has-NULL branches with ONE tiny
two-counter aggregate over the subquery (count star + count non-null) —
the same runtime decision Spark's own NullAwareAntiJoin execution makes,
collapsed to a driver scalar. At 100 TB the inner relation of a NOT IN
is a key list (dims, denylists), so the aggregate is a metadata-sized
action; the probe-side work stays a single distributed anti join either
way.

Differential bar: `tests/test_differential_fuzz.py` pins these helpers
value-equal to Spark SQL's own `NOT IN`/`IN`/`EXISTS` AND to DuckDB over
randomized null-injected cases.

Reference parity note: the reference pipeline has no subquery surface
(its one join is a pandas merge, `build_fact_fee_tax.py`); this module
is part of the engine-completeness extension surface (SURVEY.md §2 A+
subquery shapes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _values(inner: DataFrame, inner_col: str | Column) -> DataFrame:
    c = F.col(inner_col) if isinstance(inner_col, str) else inner_col
    return inner.select(c.alias("__subq_v"))


def in_filter(
    df: DataFrame, col: str | Column, inner: DataFrame, inner_col: str | Column
) -> DataFrame:
    """Rows of ``df`` where ``col IN (SELECT inner_col FROM inner)`` is
    TRUE. Pure left-semi join: equality never matches a NULL on either
    side, which IS the ANSI IN truth table's TRUE set — no driver
    action, fully distributed, AQE free to broadcast the value side."""
    probe = F.col(col) if isinstance(col, str) else col
    rhs = _values(inner, inner_col).where(F.col("__subq_v").isNotNull()).distinct()
    return df.join(rhs, on=probe == rhs["__subq_v"], how="left_semi")


def not_in_filter(
    df: DataFrame, col: str | Column, inner: DataFrame, inner_col: str | Column
) -> DataFrame:
    """Rows of ``df`` where ``col NOT IN (SELECT inner_col FROM inner)``
    is TRUE — the full 3VL: empty subquery keeps everything (NULL probes
    included), a NULL in the subquery keeps nothing, otherwise anti join
    plus a NOT NULL probe filter. The branch decision costs one
    two-counter aggregate over the subquery (driver scalar)."""
    probe = F.col(col) if isinstance(col, str) else col
    vals = _values(inner, inner_col)
    n, n_nonnull = vals.agg(
        F.count(F.lit(1)), F.count(F.col("__subq_v"))
    ).first()
    if n == 0:
        return df  # NOT IN (empty) is TRUE for every probe, even NULL
    if n_nonnull < n:
        return df.limit(0)  # a NULL in S: NOT IN is never TRUE
    rhs = vals.distinct()
    return df.where(probe.isNotNull()).join(
        rhs, on=probe == rhs["__subq_v"], how="left_anti"
    )


def exists_filter(df: DataFrame, inner: DataFrame, cond: Column) -> DataFrame:
    """Correlated ``EXISTS``: rows of ``df`` with at least one ``inner``
    row satisfying ``cond`` (a Column over both relations). Left-semi
    join — NULL correlation keys never match, exactly ANSI equality."""
    return df.join(inner, on=cond, how="left_semi")


def not_exists_filter(df: DataFrame, inner: DataFrame, cond: Column) -> DataFrame:
    """Correlated ``NOT EXISTS``: the left-anti dual of
    :func:`exists_filter`. Unlike NOT IN, NOT EXISTS has no NULL trap —
    an unmatched row passes whatever NULLs are involved — so a bare
    anti join IS the exact semantics."""
    return df.join(inner, on=cond, how="left_anti")
