"""Incremental materialized aggregate views over snapshot tables.

Every refresh must equal the from-scratch aggregation of the source
head (the oracle), while provably doing delta-sized work: only new
source files are read (the snapshot_changes contract) and only touched
view dirs rewrite (the snapshot_merge CoW contract). Exactly-once: the
applied source version rides the view manifest's operation tag, so a
replayed refresh is a no-op and a crash can never half-apply a delta.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.mview import (
    mview_applied_version,
    mview_read,
    mview_refresh,
)
from binance_data_pipeline_spark.operators.snapshots import (
    commit_snapshot,
    compact_snapshot,
    read_snapshot,
    snapshot_history,
    snapshot_merge,
)

AGGS = {
    "n": ("count", None),
    "total": ("sum", "amount"),
    "lo": ("min", "amount"),
    "hi": ("max", "amount"),
    "mean": ("avg", "amount"),
}


def _batch(spark, rows):
    return spark.createDataFrame(rows, "grp string, amount double")


def _oracle(spark, src):
    return (
        read_snapshot(spark, src)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amount").alias("total"),
            F.min("amount").alias("lo"),
            F.max("amount").alias("hi"),
            F.avg("amount").alias("mean"),
        )
    )


def _norm(df):
    return sorted(
        (r["grp"], r["n"], r["total"], r["lo"], r["hi"], r["mean"])
        for r in df.collect()
    )


def test_bootstrap_then_incremental_equals_full_agg(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(
        spark, src, _batch(spark, [("a", 1.0), ("a", 3.0), ("b", 5.0)])
    )
    assert mview_refresh(spark, src, view, ["grp"], AGGS) == 0
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, src))
    # two appends: existing group grows, new group appears, null amount
    commit_snapshot(spark, src, _batch(spark, [("a", 7.0), ("c", 2.0)]))
    commit_snapshot(spark, src, _batch(spark, [("c", None), ("d", -1.0)]))
    assert mview_refresh(spark, src, view, ["grp"], AGGS) == 2
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, src))
    assert mview_applied_version(spark, view) == 2


def test_refresh_is_replay_safe(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(spark, src, _batch(spark, [("a", 1.0)]))
    assert mview_refresh(spark, src, view, ["grp"], AGGS) == 0
    # caught up: a re-run applies nothing and commits nothing
    before = snapshot_history(spark, view).count()
    assert mview_refresh(spark, src, view, ["grp"], AGGS) is None
    assert snapshot_history(spark, view).count() == before
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, src))


def test_incremental_folds_only_touched_view_dirs(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(
        spark, src, _batch(spark, [(f"g{i:03d}", float(i)) for i in range(40)])
    )
    mview_refresh(spark, src, view, ["grp"], AGGS)
    # delta touches one group: the merge must record a 1-dir rewrite
    commit_snapshot(spark, src, _batch(spark, [("g007", 100.0)]))
    v = mview_refresh(spark, src, view, ["grp"], AGGS)
    assert v == 1
    ops = {
        int(r["version"]): r["operation"]
        for r in snapshot_history(spark, view).collect()
    }
    assert ops[max(ops)] == "mview:1"
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, src))


def test_rewrite_crossing_recomputes_or_raises(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(spark, src, _batch(spark, [("a", 1.0), ("b", 2.0)]))
    commit_snapshot(spark, src, _batch(spark, [("a", 9.0)]))
    mview_refresh(spark, src, view, ["grp"], AGGS)
    # a compaction rewrites dir identity: dir-diff stops meaning inserts
    commit_snapshot(spark, src, _batch(spark, [("b", 4.0)]))
    compact_snapshot(spark, src)
    with pytest.raises(ValueError, match="cross a rewrite"):
        mview_refresh(spark, src, view, ["grp"], AGGS, on_rewrite="raise")
    v = mview_refresh(spark, src, view, ["grp"], AGGS)  # default: recompute
    assert v == 3  # src: v0, v1, v2 appends, v3 = the compaction
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, src))
    ops = {
        int(r["version"]): r["operation"]
        for r in snapshot_history(spark, view).collect()
    }
    assert ops[max(ops)] == "mview:3"
    # and the view keeps folding incrementally after the recompute
    commit_snapshot(spark, src, _batch(spark, [("e", 6.0)]))
    assert mview_refresh(spark, src, view, ["grp"], AGGS) == 4
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, src))


def test_merge_update_exprs_counter_upsert(spark, tmp_path):
    """The snapshot_merge combine-on-match primitive stands alone: a
    counter table where matched keys ADD instead of replace."""
    t = str(tmp_path / "t")
    commit_snapshot(
        spark, t, spark.createDataFrame([("x", 10), ("y", 1)], "k string, c long")
    )
    upd = spark.createDataFrame([("x", 5), ("z", 7)], "k string, c long")
    snapshot_merge(
        spark, t, upd, ["k"], update_exprs={"c": lambda t_, u_: t_ + u_}
    )
    got = {r["k"]: r["c"] for r in read_snapshot(spark, t).collect()}
    assert got == {"x": 15, "y": 1, "z": 7}


def test_cli_mview_and_lookup_roundtrip(spark, tmp_path):
    """CLI surface: snapshot --commit --bloom-cols, --lookup, and the
    mview subcommand's spec parser drive the same code paths."""
    from binance_data_pipeline_spark.__main__ import main

    src = str(tmp_path / "src")
    batch = str(tmp_path / "in.parquet")
    _batch(spark, [("a", 1.0), ("b", 2.0)]).write.parquet(batch)
    assert (
        main(["snapshot", "--table", src, "--commit", batch,
              "--bloom-cols", "grp"]) == 0
    )
    assert main(["snapshot", "--table", src, "--lookup", "grp", "a"]) == 0
    view = str(tmp_path / "view")
    assert (
        main(["mview", "--src", src, "--view", view, "--keys", "grp",
              "--aggs", "n:count,total:sum:amount,mean:avg:amount",
              "--show", "2"]) == 0
    )
    aggs = {"n": ("count", None), "total": ("sum", "amount"),
            "mean": ("avg", "amount")}
    got = {r["grp"]: r["total"] for r in mview_read(spark, view, aggs).collect()}
    assert got == {"a": 1.0, "b": 2.0}


def test_avg_null_group_reads_as_null(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(spark, src, _batch(spark, [("a", None), ("b", 2.0)]))
    mview_refresh(spark, src, view, ["grp"], AGGS)
    rows = {r["grp"]: r for r in mview_read(spark, view, AGGS).collect()}
    assert rows["a"]["mean"] is None and rows["a"]["total"] is None
    assert rows["b"]["mean"] == 2.0
    # hidden partials are projected away
    assert "mean__sum" not in mview_read(spark, view, AGGS).columns
