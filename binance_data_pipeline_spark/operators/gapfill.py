"""Time-series gap filling — dense bucket grids with LOCF and linear
interpolation over sparse bucketed series.

The reference's rollups (dbt_project/models/marts/fact_trades.sql,
agg_revenue_daily.sql) emit one row per bucket *that has data*; buckets
with no trades are simply absent, so any consumer doing window math over
the series (moving averages, day-over-day deltas, chart rendering) sees a
ragged time axis. This operator densifies a bucketed series the way
TimescaleDB's ``time_bucket_gapfill`` + ``locf()`` / ``interpolate()``
do, expressed Spark-first:

  1. per group, one tiny aggregate finds the observed [min, max] bucket
     (or the caller pins an explicit [start, end] so every group shares
     one axis);
  2. the dense grid is ``sequence(min, max, step)`` EXPLODED from that
     one row per group — grid generation is distributed and linear in
     its own output, never a driver loop or a cross join;
  3. a left join (grid ← observed) on (group, bucket) re-attaches the
     sparse values — one hash shuffle on the same key the series is
     already grouped by;
  4. fill strategies are per-column window expressions over the grid:
       - ``locf``  : last(value, ignorenulls) over the preceding frame;
       - ``interpolate``: last non-null (value, bucket) before and first
         non-null after, then the exact linear blend
         ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)``;
         half-open edges (before first / after last observation) stay
         NULL, matching Timescale's interpolate();
       - ``null`` : leave the gap row NULL (densify only).

Scale: one small agg + one shuffle join + one window shuffle, all keyed
by the series' group columns; no collect, no cartesian. A group's grid
lives in a single task — fine for time-series whose per-group bucket
count fits a task (years of hourly buckets ≈ 10⁴ rows); for a single
global series of 10⁹ buckets, gap-fill the already-bucketed rollup, not
raw events.

Buckets are epoch-second longs (the rollup convention of
``operators/rollup.py`` / interval_join.py); timestamps work through
``unix_timestamp``/``timestamp_seconds`` at the call boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


_STRATEGIES = ("null", "locf", "interpolate")


def dense_grid(
    observed: DataFrame,
    bucket_col: str,
    step: int,
    group_cols: list[str] | None = None,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """One row per (group, bucket) over a step-spaced dense axis.

    Axis bounds default to each group's observed [min, max]; passing
    ``start``/``end`` pins that bound for EVERY group — a group keeps its
    grid rows even when all its observations fall outside the pinned
    axis (it simply fills as all-gap). A group whose resolved axis is
    empty (lo > hi) emits no rows. Output columns: group_cols +
    bucket_col."""
    group_cols = list(group_cols or [])
    b = F.col(bucket_col)
    lo = F.lit(start).cast("long") if start is not None else F.min(b)
    hi = F.lit(end).cast("long") if end is not None else F.max(b)
    bounds = observed.groupBy(*group_cols).agg(lo.alias("__lo"), hi.alias("__hi"))
    bounds = bounds.filter(F.col("__lo") <= F.col("__hi"))
    return bounds.select(
        *group_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias(bucket_col),
    )


def gapfill(
    observed: DataFrame,
    bucket_col: str,
    step: int,
    value_cols: dict[str, str],
    group_cols: list[str] | None = None,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Densify ``observed`` (one row per present (group, bucket)) onto a
    step-spaced grid and fill each value column per its strategy.

    ``value_cols`` maps column name -> strategy in {"null", "locf",
    "interpolate"}. Adds ``is_gap`` (true for synthesized rows). Every
    other column of ``observed`` is dropped — a gap row has no value for
    them and keeping half-null passengers invites silent misuse.

    Observations outside a pinned [start, end] axis (or off the step
    grid) do not participate in fills: LOCF and interpolation see only
    on-grid rows, so a pinned axis behaves like a window over the
    series, not a peek beyond it."""
    group_cols = list(group_cols or [])
    bad = {c: s for c, s in value_cols.items() if s not in _STRATEGIES}
    if bad:
        raise ValueError(f"unknown fill strategy for {bad}; pick from {_STRATEGIES}")

    grid = dense_grid(observed, bucket_col, step, group_cols, start, end)
    sparse = observed.select(
        *group_cols, bucket_col, *value_cols, F.lit(False).alias("is_gap")
    )
    dense = grid.join(sparse, on=[*group_cols, bucket_col], how="left").withColumn(
        "is_gap", F.coalesce(F.col("is_gap"), F.lit(True))
    )

    t = F.col(bucket_col).cast("double")
    behind = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ahead = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )

    filled = []
    for name, strategy in value_cols.items():
        v = F.col(name)
        if strategy == "null":
            filled.append(v.alias(name))
            continue
        prev_v = F.last(v, ignorenulls=True).over(behind)
        if strategy == "locf":
            filled.append(prev_v.alias(name))
            continue
        # interpolate: blend between the bracketing observations; the
        # bucket each was observed at rides along as a masked column so
        # one window pass yields both coordinate and value.
        prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(behind)
        next_v = F.first(v, ignorenulls=True).over(ahead)
        next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(ahead)
        span = next_t - prev_t
        blend = F.when(span == 0, prev_v).otherwise(
            prev_v + (next_v - prev_v) * (t - prev_t) / span
        )
        filled.append(
            F.when(prev_t.isNull() | next_t.isNull(), F.lit(None)).otherwise(blend)
            .alias(name)
        )

    return dense.select(*group_cols, bucket_col, *filled, "is_gap")
