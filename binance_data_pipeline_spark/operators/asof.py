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

At scale: partitions by the join key (symbol — bounded cardinality but
heavy rows); for very hot keys add a coarse time-bucket to the partition
key (bucketed as-of) — each bucket then needs the previous bucket's last
quote broadcast, which is the standard two-phase as-of at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each `left` row: latest `right` row with right.ts <= left.ts,
    same `on` key. Carried columns get `suffix`; rows with no prior right
    row carry nulls (left-outer semantics)."""
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
