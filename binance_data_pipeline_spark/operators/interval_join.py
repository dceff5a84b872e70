"""Interval (range) join: match point events to the intervals containing
them — ts ∈ [start, end] — without the cartesian plan a naive theta
join degenerates to.

Spark has no native range-join optimization for parquet relations (a
BETWEEN join condition with no equi-component plans as
BroadcastNestedLoopJoin, O(|events| × |intervals|)). The scale path
here is the standard bucketing rewrite:

  1. pick a bucket width w (≈ the typical interval length);
  2. each interval explodes to the buckets it covers
     (floor(start/w) … floor(end/w) — long intervals emit more rows);
  3. each event computes its single bucket floor(ts/w);
  4. equi-join on the bucket (plus any extra equi keys), then apply the
     exact BETWEEN as a post-join filter.

Every (event, interval) overlap is emitted exactly once — the event has
ONE bucket, and the interval covers that bucket at most once — so no
dedup pass is needed. Cost is O(|events| + Σ interval_len/w) shuffled
rows through one hash-partitioned exchange; Catalyst still broadcasts
the exploded interval side when it is small, and AQE splits skewed
buckets. ``w`` trades exploded-row count (w too small) against
post-filter waste within a bucket (w too large); the median interval
length is a good default and ``suggest_bucket_width`` measures it.

``interval_join_naive`` keeps the literal theta-join formulation as the
documented small-data baseline and the oracle for the equivalence test
(same posture as similarity.cosine_near_dup_pairs_brute).

No reference equivalent (the reference joins only on equality keys,
dbt models fact_fee_revenue.sql:18); extension surface alongside
operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_long(col: Column, dtype: str) -> Column:
    """Numeric order-preserving key: timestamps → epoch micros, numerics
    cast to long (sub-unit fractions are the caller's to scale first)."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(col)
    return col.cast("long")


def suggest_bucket_width(
    intervals: DataFrame, start_col: str = "start", end_col: str = "end"
) -> int:
    """Median interval length (in the key's units — micros for
    timestamps) via one approxQuantile pass; the recommended ``width``."""
    dtypes = dict(intervals.dtypes)
    lens = intervals.select(
        (
            _as_long(F.col(end_col), dtypes[end_col])
            - _as_long(F.col(start_col), dtypes[start_col])
        ).cast("double").alias("len")
    ).where(F.col("len") >= 0)
    q = lens.stat.approxQuantile("len", [0.5], 0.01)
    return max(int(q[0]), 1) if q else 1


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    width: int | None = None,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Bucketed interval join (see module docstring). Bounds are
    inclusive on both ends. ``on`` adds equality keys (e.g. the symbol)
    to the bucket join. ``how`` ∈ {inner, left}: left keeps unmatched
    events with NULL interval columns.

    Output: every events column, plus every intervals column not shadowed
    by an events column or join key."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = on or []
    e_types, i_types = dict(events.dtypes), dict(intervals.dtypes)
    w = width if width is not None else suggest_bucket_width(intervals, start_col, end_col)
    if w <= 0:
        raise ValueError(f"width must be positive, got {w}")

    s_key = _as_long(F.col(start_col), i_types[start_col])
    e_key = _as_long(F.col(end_col), i_types[end_col])
    lo, hi = F.floor(s_key / w), F.floor(e_key / w)
    # a pathological interval (years long against a microsecond width)
    # would materialize a billion-element sequence inside one task —
    # fail loudly with the offending span instead
    guard = F.assert_true(
        hi - lo < F.lit(10_000_000),
        F.concat(
            F.lit("interval_join: interval spans "),
            (hi - lo + 1).cast("string"),
            F.lit(f" buckets at width={w}; raise width"),
        ),
    )
    # fold the guard into the sequence bound (assert_true yields NULL on
    # success → coalesce 0): a dropped standalone guard column would be
    # pruned by Catalyst and never evaluated
    lo_guarded = lo + F.coalesce(guard.cast("long"), F.lit(0))
    ivl = intervals.where(s_key <= e_key).withColumn(
        "__bucket", F.explode(F.sequence(lo_guarded, hi))
    )
    ev = events.withColumn(
        "__bucket", F.floor(_as_long(F.col(ts_col), e_types[ts_col]) / w)
    )

    keys = ["__bucket", *on]
    ts_k = _as_long(ev[ts_col], e_types[ts_col])
    cond = (
        (ts_k >= _as_long(ivl[start_col], i_types[start_col]))
        & (ts_k <= _as_long(ivl[end_col], i_types[end_col]))
    )
    for k in keys:
        cond = (ev[k] == ivl[k]) & cond
    out_cols = [ev[c] for c in events.columns] + [
        ivl[c] for c in intervals.columns if c not in events.columns and c not in on
    ]
    return ev.join(ivl, cond, how).select(*out_cols)


def interval_join_naive(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: list[str] | None = None,
) -> DataFrame:
    """Literal theta-join formulation — O(|events| × |intervals|) pairs,
    plans as BroadcastNestedLoopJoin. The correctness oracle and the
    honest baseline for small interval tables; use ``interval_join``
    at scale."""
    on = on or []
    e_types, i_types = dict(events.dtypes), dict(intervals.dtypes)
    ts_k = _as_long(events[ts_col], e_types[ts_col])
    cond = (
        (ts_k >= _as_long(intervals[start_col], i_types[start_col]))
        & (ts_k <= _as_long(intervals[end_col], i_types[end_col]))
    )
    for k in on:
        cond = (events[k] == intervals[k]) & cond
    out_cols = [events[c] for c in events.columns] + [
        intervals[c]
        for c in intervals.columns
        if c not in events.columns and c not in on
    ]
    return events.join(intervals, cond, "inner").select(*out_cols)
