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


def test_derived_time_bucket_keys(spark, tmp_path):
    """The hourly-rollup shape: grouping key is an expression the source
    never materializes, evaluated map-side on each delta."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    rows1 = [("2024-01-01 10:05:00", 1.0), ("2024-01-01 10:55:00", 3.0)]
    rows2 = [("2024-01-01 10:59:00", 5.0), ("2024-01-01 11:01:00", 7.0)]
    mk = lambda rows: spark.createDataFrame(
        rows, "ts string, amount double"
    ).selectExpr("cast(ts as timestamp) as ts", "amount")
    aggs = {"n": ("count", None), "total": ("sum", "amount")}
    dk = {"hour": "date_trunc('hour', ts)"}
    commit_snapshot(spark, src, mk(rows1))
    mview_refresh(spark, src, view, ["hour"], aggs, derived_keys=dk)
    commit_snapshot(spark, src, mk(rows2))
    mview_refresh(spark, src, view, ["hour"], aggs, derived_keys=dk)
    got = {
        str(r["hour"]): (r["n"], r["total"])
        for r in mview_read(spark, view, aggs).collect()
    }
    assert got == {
        "2024-01-01 10:00:00": (3, 9.0),
        "2024-01-01 11:00:00": (1, 7.0),
    }


def test_randomized_refresh_model_check(spark, tmp_path):
    """Random interleaving of source appends, compactions, and refreshes
    must keep every refreshed view state equal to the from-scratch
    aggregation of the source at that moment — the independent model."""
    import random

    rng = random.Random(7)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    groups = ["a", "b", "c", "d"]

    def rand_batch():
        n = rng.randint(1, 5)
        return _batch(
            spark,
            [
                (rng.choice(groups), rng.choice([None, round(rng.uniform(-5, 5), 2)]))
                for _ in range(n)
            ],
        )

    commit_snapshot(spark, src, rand_batch())
    mview_refresh(spark, src, view, ["grp"], AGGS)
    checks = 0
    for step in range(10):
        op = rng.choice(["append", "append", "refresh", "compact", "delete"])
        if op == "append":
            commit_snapshot(spark, src, rand_batch())
        elif op == "compact":
            compact_snapshot(spark, src)
        elif op == "delete":
            # source DML is a rewrite crossing: the next refresh must
            # recompute, and the recomputed view must match the model
            from binance_data_pipeline_spark.operators.snapshots import (
                snapshot_delete,
            )

            snapshot_delete(spark, src, F.col("grp") == rng.choice(groups))
        else:
            mview_refresh(spark, src, view, ["grp"], AGGS)
            assert _norm(mview_read(spark, view, AGGS)) == _norm(
                _oracle(spark, src)
            ), f"model divergence at step {step}"
            checks += 1
    mview_refresh(spark, src, view, ["grp"], AGGS)
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, src))
    assert checks >= 1


def test_streaming_ingest_chains_view_refresh(spark, tmp_path):
    """streaming_snapshot_append(refresh_views=...) keeps a rollup live
    as micro-batches land, and total checkpoint loss double-counts
    neither the table nor the view (both replay guards compose)."""
    from binance_data_pipeline_spark.operators.snapshots import (
        streaming_snapshot_append,
    )

    src_files = str(tmp_path / "in")
    tbl, view = str(tmp_path / "t"), str(tmp_path / "view")
    _batch(spark, [("a", 1.0), ("a", 3.0), ("b", 2.0)]).write.parquet(src_files)
    stream = spark.readStream.schema("grp string, amount double").parquet(src_files)
    spec = {"view_table": view, "key_cols": ["grp"], "aggs": AGGS}
    q = (
        streaming_snapshot_append(
            stream, tbl, str(tmp_path / "cp1"), refresh_views=[spec]
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, tbl))
    # fresh checkpoint: the source replays; table skips the batch and
    # the view's cursor makes its refresh a no-op
    q2 = (
        streaming_snapshot_append(
            stream, tbl, str(tmp_path / "cp2"), refresh_views=[spec]
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert read_snapshot(spark, tbl).count() == 3
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, tbl))


def test_empty_delta_advances_cursor_without_data_commit(spark, tmp_path):
    """A source head that advanced with no rows (empty append) must move
    the view's cursor via a metadata-only commit — no merge discovery
    scan, no new data dir, same live set."""
    from binance_data_pipeline_spark.operators.snapshots import _live_dirs

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(spark, src, _batch(spark, [("a", 1.0)]))
    mview_refresh(spark, src, view, ["grp"], AGGS)
    commit_snapshot(spark, src, _batch(spark, []).limit(0))
    dirs_before = _live_dirs(spark, view, 0)
    assert mview_refresh(spark, src, view, ["grp"], AGGS) == 1
    assert mview_applied_version(spark, view) == 1
    assert _live_dirs(spark, view, 1) == dirs_before
    assert _norm(mview_read(spark, view, AGGS)) == _norm(_oracle(spark, src))
    # caught up: nothing further
    assert mview_refresh(spark, src, view, ["grp"], AGGS) is None


def test_avg_null_group_reads_as_null(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(spark, src, _batch(spark, [("a", None), ("b", 2.0)]))
    mview_refresh(spark, src, view, ["grp"], AGGS)
    rows = {r["grp"]: r for r in mview_read(spark, view, AGGS).collect()}
    assert rows["a"]["mean"] is None and rows["a"]["total"] is None
    assert rows["b"]["mean"] == 2.0
    # hidden partials are projected away
    assert "mean__sum" not in mview_read(spark, view, AGGS).columns


def test_approx_distinct_folds_sketches_not_estimates(spark, tmp_path):
    """approx_distinct: the view stores the mergeable HLL sketch, so an
    incremental fold over overlapping deltas equals the from-scratch
    sketch of the whole source — estimates would double-count the
    overlap, unions cannot. Small cardinalities estimate exactly."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    aggs = {"users": ("approx_distinct", "uid"), "n": ("count", None)}

    def batch(rows):
        return spark.createDataFrame(rows, "grp string, uid string")

    commit_snapshot(
        spark, src, batch([("a", "u1"), ("a", "u2"), ("b", "u1")])
    )
    mview_refresh(spark, src, view, ["grp"], aggs)
    got = {
        r["grp"]: (r["users"], r["n"])
        for r in mview_read(spark, view, aggs).collect()
    }
    assert got == {"a": (2, 2), "b": (1, 1)}
    # hidden sketch column never surfaces through the reader
    assert "users__hll" not in mview_read(spark, view, aggs).columns

    # delta OVERLAPS the seen uids: u1/u2 again plus new u3, new group c
    commit_snapshot(
        spark,
        src,
        batch([("a", "u1"), ("a", "u3"), ("b", "u2"), ("c", "u9")]),
    )
    mview_refresh(spark, src, view, ["grp"], aggs)
    got = {
        r["grp"]: (r["users"], r["n"])
        for r in mview_read(spark, view, aggs).collect()
    }
    # a: {u1,u2,u3}=3 (estimate-addition would say 4), b: {u1,u2}=2
    assert got == {"a": (3, 4), "b": (2, 2), "c": (1, 1)}

    # replay is a no-op
    assert mview_refresh(spark, src, view, ["grp"], aggs) is None

    # equals the from-scratch estimate over the head
    oracle = {
        r["grp"]: r["d"]
        for r in read_snapshot(spark, src)
        .groupBy("grp")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("uid", 12)).alias("d"))
        .collect()
    }
    assert {g: d for g, (d, _) in got.items()} == oracle


def test_approx_distinct_all_null_group_reads_zero(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    aggs = {"users": ("approx_distinct", "uid")}
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", "u1")], "grp string, uid string"
    )
    commit_snapshot(spark, src, df)
    mview_refresh(spark, src, view, ["grp"], aggs)
    got = {
        r["grp"]: r["users"] for r in mview_read(spark, view, aggs).collect()
    }
    assert got == {"a": 0, "b": 1}
