"""Behavioral analytics over event streams — funnel conversion and
cohort retention, the two product-analytics queries every event table
gets asked (the sessionization in plans/pipeline.py is the third of the
family). Both are pure DataFrame plans with DuckDB-expressible
semantics, cross-checked in tests.

Funnel: a user converts step i when they have a step-i event STRICTLY
AFTER their earliest qualifying step-(i−1) event (first-touch
attribution, the standard product-analytics convention), optionally
within a window of their step-1 entry. The plan is a chain of
``len(steps)`` per-user min-aggregates + equi-joins — each join keyed
on user, each aggregate map-side combinable; no window over the whole
event table, no Python.

Cohort retention: users grouped by the period of their FIRST event;
retention[k] = fraction active k periods later. Two aggregates and one
join — cohort sizes ride along so the output is self-contained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_conversion", "cohort_retention"]


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-step funnel: (step_idx, step, n_users) — n_users = users who
    reached the step in order. ``within_seconds`` bounds the WHOLE
    funnel relative to each user's step-1 entry time (None = unbounded).
    Monotone by construction: n_users never increases down the funnel."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    base = events.select(
        F.col(user_col).alias("u"), F.col(event_col).alias("e"), F.col(ts_col).alias("t")
    )
    # step 1: earliest entry per user
    reached = (
        base.where(F.col("e") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t_prev"))
        .withColumn("t_entry", F.col("t_prev"))
    )

    def leg(i: int, step: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(step).alias("step"), "n_users"
        )

    # ONE lazy plan instead of a driver-side .count() job per step: the
    # per-step count jobs each re-ran the whole prior chain (step 3 paid
    # steps 1-2 again); as union legs of a single plan, ReuseExchange
    # dedupes the shared per-user aggregates and the caller pays one job
    legs = [leg(0, steps[0], reached)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = base.where(F.col("e") == step)
        joined = nxt.join(reached, "u").where(F.col("t") > F.col("t_prev"))
        if within_seconds is not None:
            joined = joined.where(
                F.col("t").cast("long") - F.col("t_entry").cast("long")
                <= F.lit(int(within_seconds))
            )
        reached = joined.groupBy("u", "t_entry").agg(F.min("t").alias("t_prev"))
        legs.append(leg(i, step, reached))
    out = legs[0]
    for extra in legs[1:]:
        out = out.unionByName(extra)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """(cohort, period_offset, n_active, n_cohort, retention): users
    bucketed by the period of their first event; a (cohort, k) row
    counts users with ANY event k periods after their cohort period.
    ``period``: 'day' | 'week' | 'month'. Offsets for day/week are exact
    date arithmetic; 'month' uses calendar months. Offset 0 is the
    cohort itself (retention 1.0 by construction — pinned in tests)."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day|week|month, got {period}")
    base = events.select(F.col(user_col).alias("u"), F.col(ts_col).alias("t"))
    firsts = base.groupBy("u").agg(F.min("t").alias("t0"))

    def bucket(c):
        return F.date_trunc(period, c)

    if period == "month":
        offset = (
            (F.year(F.col("tb")) - F.year(F.col("cb"))) * 12
            + (F.month(F.col("tb")) - F.month(F.col("cb")))
        )
    else:
        days = F.datediff(F.to_date(F.col("tb")), F.to_date(F.col("cb")))
        offset = days if period == "day" else (days / 7).cast("int")

    activity = (
        base.join(firsts, "u")
        .select(
            "u",
            bucket(F.col("t0")).alias("cb"),
            bucket(F.col("t")).alias("tb"),
        )
        .select("u", "cb", offset.cast("int").alias("k"))
        .distinct()
    )
    if max_offset is not None:
        activity = activity.where(F.col("k") <= max_offset)
    sizes = firsts.select("u", bucket(F.col("t0")).alias("cb")).groupBy("cb").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        activity.groupBy("cb", "k")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "cb")
        .select(
            F.col("cb").alias("cohort"),
            F.col("k").alias("period_offset"),
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 4).alias("retention"),
        )
    )
