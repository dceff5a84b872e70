"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key (trade × quote style — SURVEY §2.3 notes this as
the natural extension beyond the reference's single equi-join).

Implementation is the union-and-carry trick — no pandas merge_asof, no
per-key loops:

  1. tag both sides, union on (key, ts)
  2. one window pass per key ordered by (ts, side-priority): `last(right
     value, ignorenulls)` carries the latest right-side payload forward
  3. keep left rows; the carried columns ARE the as-of match

One shuffle total (the window partition), versus a join+groupBy+re-join
(3 shuffles) or an interval cross-join. Ordering puts the right side first
on ties → "at or before" semantics (a quote exactly at the trade time
matches).

Scale path (``bucket_seconds``): partitioning by the key alone puts a
whole symbol's history in ONE task — fatal for bounded-cardinality keys
(a handful of hot symbols) at 100×. The bucketed two-phase form adds a
coarse time bucket to the window partition key, so a hot key splits into
(key × bucket) tasks:

  phase 1: carry within (key, bucket) — the same union-and-carry, just a
           narrower window partition
  phase 2: per-(key, bucket) last NON-NULL value of each carried column
           → small bucket-level table (≤ keys × buckets rows); a second
           window over BUCKETS per key, shifted one bucket back, yields
           each bucket's carry-in (the last quote from any earlier bucket)
  phase 3: join the carry-in back on (key, bucket) — no broadcast hint;
           AQE converts to broadcast at runtime only when the measured
           carry-in size fits (keys × buckets can be huge at scale);
           result = coalesce(within-bucket carry, carry-in)

Both forms produce identical results (equality is pinned in
tests/test_operators.py); the bucketed one trades two cheap bucket-level
ops for bounded task size.

Round-13 I/O shape (guide §2.4/§6): both phases hang off ONE explicit
``repartition(key, bucket)`` whose identical subtrees ReuseExchange
dedupes at execution, so the union is scanned and shuffled once — the
earlier form re-derived phase 2 and its (key, bucket) spine from fresh
scans (4 file scans in the committed r12 plan of asof_purchase_click).
Phase 2 aggregates over ALL rows (max_by keyed on a null-when-left
ordering skips left rows without a filter that would push below the
exchange and break reuse), which also subsumes the spine: every
(key, bucket) present in the data gets a bucket row, left-only buckets
included. ``asof_join_union`` is the single-scan entry for the common
case where both sides derive from the same table — the tagged union is
built by the caller as one filtered scan instead of two.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bucket_expr(df: DataFrame, ts_col: str, bucket_seconds: int) -> Column:
    """Coarse time bucket; timestamps go through epoch seconds, numeric
    time axes divide directly."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        sec = F.unix_timestamp(F.col(ts_col))
    else:
        sec = F.col(ts_col)
    return F.floor(sec / F.lit(bucket_seconds))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """For each `left` row: latest `right` row with right.ts <= left.ts,
    same `on` key. Carried columns get `suffix`; rows with no prior right
    row carry nulls (left-outer semantics).

    ``bucket_seconds=None`` → single window partitioned by the key
    (fine for high-cardinality keys). Set it (e.g. 86400 for daily) for
    bounded-cardinality keys so no single task owns a whole key's
    history."""
    lcols = left.columns
    tagged_left = left.select(
        *lcols, F.lit(1).alias("__side"), *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols]
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in (on, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    return asof_join_union(
        unioned, lcols, on, ts_col, value_cols,
        suffix=suffix, bucket_seconds=bucket_seconds,
    )


def asof_join_union(
    unioned: DataFrame,
    left_cols: list[str],
    on: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """``asof_join`` over a caller-built tagged union — the SINGLE-SCAN
    form for the common case where left and right rows live in the same
    table (guide §6 I/O consolidation: one filtered scan instead of a
    union of two scans of the same file). ``unioned`` must carry
    ``left_cols`` (null on right rows except ``on``/``ts_col``),
    ``__side`` (1 = left, 0 = right) and ``__r_{c}`` for each value
    column (null on left rows). Semantics identical to ``asof_join`` —
    that entry builds the same union from two frames and delegates
    here."""
    lcols = left_cols

    if bucket_seconds is None:
        w = (
            Window.partitionBy(on)
            .orderBy(ts_col, "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            *lcols,
            "__side",
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
        return carried.where(F.col("__side") == 1).drop("__side")

    # ---- bucketed two-phase form ------------------------------------
    unioned = unioned.withColumn("__asof_bucket", _bucket_expr(unioned, ts_col, bucket_seconds))
    # ONE exchange feeds both phases: the explicit (key, bucket)
    # repartition satisfies phase 1's window distribution AND phase 2's
    # aggregate clustering, and because both branches reference the
    # identical exchange subtree, ReuseExchange dedupes it at execution —
    # the union (and the scans under it) is computed and shuffled ONCE
    # where the previous form re-derived phase 2 and its spine from
    # fresh scans (guide §2.4).
    shuffled = unioned.repartition(on, "__asof_bucket")

    # phase 1: within-bucket carry (window partition = key × bucket)
    w = (
        Window.partitionBy(on, "__asof_bucket")
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = shuffled.select(
        *lcols,
        "__side",
        "__asof_bucket",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__in_{c}")
            for c in value_cols
        ],
    )

    # phase 2: per-bucket last NON-NULL value of EACH column, then a
    # bucket-level window per key shifted one bucket back = each bucket's
    # carry-in. Per-column (not a single max_by over the whole value
    # struct) so the bucketed form matches the single-window
    # last(ignorenulls) semantics even when a right row is NULL in one
    # value column but an earlier row has a value: max_by with a
    # NULL-filtered ordering skips NULL-valued rows, so each column
    # independently carries its own latest non-null. Aggregating ALL rows
    # of ``shuffled`` (no ``__side == 0`` filter) is equivalent — left
    # rows have null ``__r_{c}``, so the null-keyed max_by ignores them —
    # and it subsumes the old (key, bucket) spine: every bucket present
    # in the data gets a row (null-valued when it holds no right rows),
    # so left-only buckets still receive a carry-in.
    #
    # Column pruning intentionally specializes this branch below the
    # repartition (it reads only key/bucket/ts/values), so the two
    # branches keep separate, NARROWER exchanges instead of one reused
    # wide one. Measured both at sf0.1: forcing a fully shared subtree
    # (phase 2 re-aggregating phase 1's window output) re-runs the
    # window sort per branch and lost ~0.2-0.4 s/query vs this shape;
    # the pruned second scan+exchange is the cheaper duplicate — and at
    # scale a 4-column pushed-filter scan beats re-sorting the union.
    bucket_last = shuffled.groupBy(on, "__asof_bucket").agg(
        *[
            F.max_by(
                F.col(f"__r_{c}"),
                F.when(F.col(f"__r_{c}").isNotNull(), F.col(ts_col)),
            ).alias(f"__last_{c}")
            for c in value_cols
        ]
    )
    wb = Window.partitionBy(on).orderBy("__asof_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry_in = bucket_last.select(
        on,
        "__asof_bucket",
        *[
            F.last(f"__last_{c}", ignorenulls=True).over(wb).alias(f"__carry_{c}")
            for c in value_cols
        ],
    )

    # phase 3: stitch — within-bucket value wins, else the carry-in.
    # carry_in is at most keys × buckets rows; usually tiny, but at
    # 100× scale (1M keys × years of buckets) it can exceed any broadcast
    # budget — so no unconditional broadcast hint here. AQE measures the
    # shuffle output at runtime and converts to BroadcastHashJoin only
    # when carry_in actually fits (spark.sql.adaptive.autoBroadcastJoin-
    # Threshold), falling back to a shuffle join otherwise. That IS the
    # size guard, measured rather than guessed.
    out = carried.join(carry_in, [on, "__asof_bucket"], "left").select(
        *lcols,
        "__side",
        *[
            F.coalesce(F.col(f"__in_{c}"), F.col(f"__carry_{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return out.where(F.col("__side") == 1).drop("__side")
