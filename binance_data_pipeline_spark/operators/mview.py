"""Incrementally maintained materialized aggregate views over snapshot
tables.

The reference maintains its rollups by re-running dbt models over the
whole warehouse (reference dbt/models/marts/fct_revenue_daily.sql — a
full-table GROUP BY per run; the incremental high-watermark model only
bounds the STAGING scan). This module is the table-format-native
version: a view = ``GROUP BY key_cols`` with associative aggregates
(count/sum/min/max/avg/approx_distinct) over a snapshot source table,
refreshed by

1. reading ONLY the source rows added since the last applied source
   version (``snapshot_changes`` — the file-diff change feed, new files
   only, no table rescan),
2. partially aggregating that delta (map-side combine, one shuffle the
   size of the DELTA's key set), and
3. folding the partials into the view with ``snapshot_merge``'s
   combine-on-match ``update_exprs`` — copy-on-write bounded to the
   view dirs that actually hold touched keys.

At 100 TB the steady-state refresh cost is O(new data + touched view
dirs), never O(source) or O(view).

Exactly-once across crashes and re-runs: the applied source version
rides the VIEW manifest's operation field (``mview:{src_version}``), so
delta data and cursor commit in one atomic rename — the
``snapshot_append_batch`` recipe. A replayed refresh (applied >= source
head) is a no-op. Like the stream-append contract, one refresher per
view; ad-hoc readers are unrestricted.

A source range that crosses a rewrite (overwrite/rollback/compaction
changed dir identity, so dir-diff stops meaning row inserts) cannot be
folded incrementally: count/sum would need retractions and min/max a
re-scan of affected groups. The refresher then recomputes the view in
full as ONE overwrite commit (still atomic, still tagged with the
applied version) — correct for every supported aggregate, and the view
stays time-travelable across the recompute. ``on_rewrite='raise'``
surfaces the crossing instead when a full source scan must not hide
behind a refresh call.

``avg`` is stored as its sum/count partials (hidden ``{out}__sum`` /
``{out}__cnt`` columns — the only decomposition that merges
associatively) and re-derived at read; ``approx_distinct`` is stored as
its Datasketches HLL sketch (hidden ``{out}__hll`` binary, ~2^lgK
bytes/group — estimates don't fold, sketches union losslessly) and
estimated at read; ``mview_read`` is the one reader that knows to
project both back. COUNT DISTINCT is the aggregate full-rescan rollups
exist for — here a per-group KB sketch makes it incrementally
maintainable with the same exactly-once fold as sum/count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshots import (
    _list_versions,
    commit_snapshot,
    read_snapshot,
    snapshot_changes,
    snapshot_history,
    snapshot_merge,
)

__all__ = ["mview_refresh", "mview_read", "mview_applied_version"]

_OP = "mview"

_SUPPORTED = ("count", "sum", "min", "max", "avg", "approx_distinct")

#: lgConfigK for approx_distinct partials — fixed for a view's lifetime
#: (sketches with different K never union; the Spark default).
_HLL_LGK = 12


def _expand(aggs: dict) -> list[tuple[str, str, object]]:
    """[(physical_col, fn, input)] — avg expands to its sum/cnt pair,
    approx_distinct to its hidden HLL sketch column."""
    out = []
    for name, (fn, expr) in aggs.items():
        if fn not in _SUPPORTED:
            raise ValueError(f"unsupported aggregate {fn!r} (have {_SUPPORTED})")
        if fn == "avg":
            if expr is None:
                raise ValueError("avg requires an input expression")
            out.append((f"{name}__sum", "sum", expr))
            out.append((f"{name}__cnt", "count", expr))
        elif fn == "approx_distinct":
            if expr is None:
                raise ValueError("approx_distinct requires an input expression")
            # stored as the MERGEABLE state (Datasketches HLL binary),
            # not the estimate: estimates don't fold, sketches do —
            # the same partial-aggregation law the other five rest on
            out.append((f"{name}__hll", "approx_distinct", expr))
        else:
            out.append((name, fn, expr))
    return out


def _partial(fn: str, expr) -> Column:
    col = F.expr(expr) if isinstance(expr, str) else expr
    if fn == "count":
        return F.count(F.lit(1)) if expr is None else F.count(col)
    if fn == "approx_distinct":
        return F.hll_sketch_agg(col, _HLL_LGK)
    return {"sum": F.sum, "min": F.min, "max": F.max}[fn](col)


def _combine(fn: str):
    """existing ⊕ incoming, with SQL aggregate NULL semantics: count is
    never NULL; sum of two partials is NULL only when both are (least/
    greatest already skip NULLs, matching min/max over a group); an HLL
    sketch union treats a NULL side (all-NULL input delta) as empty."""
    if fn in ("count",):
        return lambda t, u: t + u
    if fn == "sum":
        return lambda t, u: (
            F.when(t.isNull(), u).when(u.isNull(), t).otherwise(t + u)
        )
    if fn == "min":
        return lambda t, u: F.least(t, u)
    if fn == "approx_distinct":
        return lambda t, u: (
            F.when(t.isNull(), u)
            .when(u.isNull(), t)
            .otherwise(F.hll_union(t, u))
        )
    return lambda t, u: F.greatest(t, u)


def mview_applied_version(spark: SparkSession, view_table: str) -> int | None:
    """Highest source version the view has applied — parsed from the
    ``mview:{N}`` operation tags its own manifests carry (KB-scale
    metadata read). None when the view has never been refreshed."""
    if not _list_versions(spark, view_table):
        return None
    row = (
        snapshot_history(spark, view_table)
        .where(F.col("operation").startswith(f"{_OP}:"))
        .agg(
            F.max(
                F.split(F.col("operation"), ":").getItem(1).cast("long")
            ).alias("v")
        )
        .first()
    )
    return None if row is None or row["v"] is None else int(row["v"])


def mview_refresh(
    spark: SparkSession,
    src_table: str,
    view_table: str,
    key_cols: list[str],
    aggs: dict,
    on_rewrite: str = "recompute",
    derived_keys: dict[str, str] | None = None,
) -> int | None:
    """Bring ``view_table`` up to ``src_table``'s head; returns the
    applied source version, or None when already caught up.

    ``aggs``: {out_col: (fn, input)} with fn in count/sum/min/max/avg/
    approx_distinct; input is a column name / SQL expression string
    (None for count(*)).
    The first call bootstraps the view with a full aggregation; later
    calls fold only the source delta (see module docstring for the
    exactly-once and rewrite contracts).

    ``derived_keys`` ({key_name: sql_expr}) projects grouping keys the
    source doesn't materialize — the time-bucket rollup shape
    (``{"hour": "date_trunc('hour', event_time)"}``) — evaluated
    map-side on the delta before aggregation; names then appear in
    ``key_cols`` like any physical column. Deterministic expressions
    only: the fold assumes a source row buckets identically on every
    refresh."""
    if on_rewrite not in ("recompute", "raise"):
        raise ValueError(f"on_rewrite must be recompute|raise, got {on_rewrite!r}")
    phys = _expand(aggs)
    src_versions = _list_versions(spark, src_table)
    if not src_versions:
        raise ValueError(f"{src_table} has no committed snapshots")
    head = src_versions[-1]
    applied = mview_applied_version(spark, view_table)
    if applied is not None and head <= applied:
        return None

    def _aggregate(df: DataFrame) -> DataFrame:
        for name, sql in (derived_keys or {}).items():
            df = df.withColumn(name, F.expr(sql))
        return df.groupBy(*key_cols).agg(
            *[_partial(fn, expr).alias(name) for name, fn, expr in phys]
        )

    if applied is None:
        full = _aggregate(read_snapshot(spark, src_table, version=head))
        commit_snapshot(
            spark, view_table, full, mode="overwrite", operation=f"{_OP}:{head}"
        )
        return head
    try:
        delta = snapshot_changes(spark, src_table, applied, head)
    except ValueError as e:
        if "cross a rewrite" not in str(e):
            raise
        if on_rewrite == "raise":
            raise
        full = _aggregate(read_snapshot(spark, src_table, version=head))
        commit_snapshot(
            spark, view_table, full, mode="overwrite", operation=f"{_OP}:{head}"
        )
        return head
    partials = _aggregate(delta)
    if partials.isEmpty():
        # head advanced with no rows (empty appends): advance the cursor
        # with a METADATA-ONLY commit (same live set, new manifest — the
        # rollback-to-self shape) instead of a merge whose discovery
        # would scan every view dir for zero update keys
        import time as _time

        from .snapshots import _head_version as _head_of
        from .snapshots import _max_streamed_batch, _write_manifest_commit
        from .snapshots import _live_entries as _entries
        from .snapshots import table_schema as _tschema

        for _ in range(10):
            vh = _head_of(spark, view_table)
            if _write_manifest_commit(
                spark,
                view_table,
                vh + 1,
                _entries(spark, view_table, vh),
                f"{_OP}:{head}",
                _time.time(),
                stream_hwm=_max_streamed_batch(spark, view_table),
                table_schema_json=_tschema(spark, view_table, vh).json(),
            ):
                return head
        raise RuntimeError(f"mview cursor commit to {view_table} lost 10 races")
    snapshot_merge(
        spark,
        view_table,
        partials,
        key_cols,
        update_exprs={name: _combine(fn) for name, fn, _ in phys},
        operation=f"{_OP}:{head}",
    )
    return head


def mview_read(
    spark: SparkSession,
    view_table: str,
    aggs: dict,
    version: int | None = None,
) -> DataFrame:
    """The view with derived aggregates projected back: avg columns are
    recombined from their stored sum/cnt partials (NULL when the group
    counted nothing non-null, matching SQL AVG), approx_distinct columns
    estimated from their stored HLL sketches (0 for an all-NULL group,
    matching approx_count_distinct); everything else reads as stored."""
    df = read_snapshot(spark, view_table, version=version)
    drop, add = [], []
    for name, (fn, _) in aggs.items():
        if fn == "avg":
            s, c = f"{name}__sum", f"{name}__cnt"
            add.append(
                F.when(F.col(c) > 0, F.col(s) / F.col(c)).alias(name)
            )
            drop += [s, c]
        elif fn == "approx_distinct":
            h = f"{name}__hll"
            add.append(
                F.when(
                    F.col(h).isNotNull(), F.hll_sketch_estimate(F.col(h))
                )
                .otherwise(F.lit(0))
                .alias(name)
            )
            drop.append(h)
    if not add:
        return df
    keep = [c for c in df.columns if c not in drop]
    return df.select(*keep, *add)
