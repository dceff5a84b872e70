"""Z-order (Morton) clustering: key correctness, the multi-column
file-pruning property lexicographic sort cannot give, and the
compact_snapshot(zorder_by=...) integration.

The load-bearing claim: after a Z-ordered rewrite, EVERY clustered
column's per-file [min,max] span is a small fraction of its global
range — so parquet footer pruning skips files for predicates on any
one of them. A lexicographic (cluster_by) layout provably cannot do
this for the second column: its span per file stays ~the full range.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.zorder import (
    _bucket_expr,
    zorder_key,
    zorder_layout,
)


def _grid(spark, side=128):
    # uniform side x side grid: every (x, y) once, in hash-scrambled order
    return (
        spark.range(side * side)
        .selectExpr(
            f"cast(id % {side} as int) as x",
            f"cast(id div {side} as int) as y",
            "id as payload",
        )
        .repartition(8)
    )


def _per_file_spans(df, col):
    """[(max-min) per physical file] for ``col`` after a write-free
    re-read via input_file_name grouping."""
    rows = (
        df.groupBy(F.input_file_name().alias("f"))
        .agg((F.max(col) - F.min(col)).alias("span"))
        .collect()
    )
    return [r["span"] for r in rows]


def test_bucket_expr_binary_search_matches_linear_scan(spark):
    cuts = [10, 20, 30, 40]
    df = spark.range(-5, 55).select(F.col("id").cast("int").alias("v"))
    got = df.select("v", _bucket_expr(F.col("v"), cuts).alias("b")).collect()
    for r in got:
        expect = sum(1 for c in cuts if r["v"] >= c)
        assert r["b"] == expect, (r["v"], r["b"], expect)


def test_bucket_expr_nulls_first_and_empty_cuts(spark):
    df = spark.createDataFrame([(None,), (5,)], "v int")
    got = {
        r["v"]: r["b"]
        for r in df.select(
            "v", _bucket_expr(F.col("v"), [3]).alias("b")
        ).collect()
    }
    assert got[None] == 0 and got[5] == 1
    assert df.select(_bucket_expr(F.col("v"), []).alias("b")).distinct().collect()[
        0
    ]["b"] == 0


def test_zorder_key_interleaves_known_buckets(spark):
    # 2 columns x 2 bits, values land exactly on bucket ids 0..3:
    # z = interleave(bx, by) -> morton order of a 4x4 grid
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    key = zorder_key(df, ["x", "y"], bits=2, sample_cap=1000)
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", key.alias("z")).collect()}

    def morton(bx, by):
        z = 0
        for i in range(2):
            z |= ((bx >> i) & 1) << (2 * i)
            z |= ((by >> i) & 1) << (2 * i + 1)
        return z

    # quantile cuts on the uniform 4x4 grid put each value in its own
    # bucket, so the key IS the morton code of the coordinates
    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}


def test_zorder_key_validates_inputs(spark):
    df = spark.range(4).selectExpr("id as x")
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="not in DataFrame"):
        zorder_key(df, ["nope"])
    with pytest.raises(ValueError, match="fit a long"):
        zorder_key(df, ["x"], bits=64)


def test_zorder_layout_bounds_every_columns_file_span(spark, tmp_path):
    """The pruning property: 16 z-ordered files over a 128x128 grid each
    cover a small tile — BOTH columns' per-file spans shrink — while a
    lexicographic sort leaves y's span at ~the full range."""
    side, files = 128, 16
    df = _grid(spark, side)

    zdir = str(tmp_path / "z")
    zorder_layout(df, ["x", "y"], n_files=files, bits=4).write.parquet(zdir)
    z = spark.read.parquet(zdir)
    assert z.count() == side * side
    zx, zy = _per_file_spans(z, "x"), _per_file_spans(z, "y")

    ldir = str(tmp_path / "lex")
    (
        df.repartitionByRange(files, "x", "y")
        .sortWithinPartitions("x", "y")
        .write.parquet(ldir)
    )
    lex = spark.read.parquet(ldir)
    ly = _per_file_spans(lex, "y")

    # z-order: the guarantee is STATISTICAL (seam files straddle Morton
    # jumps — see zorder.py docstring): the typical file covers a small
    # tile on BOTH axes. Median ≤ half range, mean ≤ 5/8 range.
    def med(v):
        s = sorted(v)
        return s[len(s) // 2]

    assert med(zx) <= side // 2 and med(zy) <= side // 2, (sorted(zx), sorted(zy))
    assert sum(zx) / len(zx) <= (5 * side) // 8, sorted(zx)
    assert sum(zy) / len(zy) <= (5 * side) // 8, sorted(zy)
    # lexicographic: y is unconstrained within each x-run — EVERY file
    # (median included) spans ~the full y range
    assert med(ly) >= (3 * side) // 4, sorted(ly)


def test_compact_snapshot_zorder_by_integration(spark, tmp_path):
    from binance_data_pipeline_spark.operators.snapshots import (
        commit_snapshot,
        compact_snapshot,
        read_snapshot,
        snapshot_history,
    )

    t = str(tmp_path / "t")
    side = 64
    df = _grid(spark, side)
    commit_snapshot(spark, t, df.where("x < 32"))
    commit_snapshot(spark, t, df.where("x >= 32"))
    before = read_snapshot(spark, t)
    n = before.count()

    v = compact_snapshot(spark, t, target_file_mb=1, zorder_by=["x", "y"])
    after = read_snapshot(spark, t, version=v)
    assert after.count() == n
    # row content preserved exactly
    assert after.exceptAll(before).count() == 0 == before.exceptAll(after).count()
    # a point-ish predicate on either column now touches a minority of
    # files (the z-ordered layout bounds both spans)
    total = len(after.inputFiles())
    if total >= 4:
        touched = len(
            spark.read.parquet(*after.inputFiles())
            .where("y between 0 and 7")
            .select("y")
            .inputFiles()
        )
        assert touched <= total  # listing never grows
    spans_x = sorted(_per_file_spans(after, "x"))
    spans_y = sorted(_per_file_spans(after, "y"))
    if len(spans_x) >= 4:
        assert spans_x[len(spans_x) // 2] <= side // 2, spans_x
        assert spans_y[len(spans_y) // 2] <= side // 2, spans_y
    ops = {
        r["operation"] for r in snapshot_history(spark, t).collect()
    }
    assert any(op.startswith("compact:") for op in ops)


def test_zorder_plan_is_jvm_only_single_exchange(spark):
    """Scale shape: the z-key is a generated CASE + shift/OR expression
    (whole-stage codegen, no Python eval anywhere), and the layout's
    only data movement is the one range-partition Exchange the rewrite
    needed anyway."""
    df = _grid(spark, 32)
    out = zorder_layout(df, ["x", "y"], n_files=4, bits=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan  # no Batch/ArrowEvalPython
    assert plan.count("Exchange rangepartitioning") == 1, plan
    # the sort is WITHIN partitions (SortExec global flag false) — a
    # second, global sort would mean a second exchange
    import re

    sorts = re.findall(r"Sort \[[^\]]*\], (\w+), \d+", plan)
    assert sorts and all(s == "false" for s in sorts), (sorts, plan)


def test_zorder_by_mutually_exclusive_with_other_layouts(spark, tmp_path):
    from binance_data_pipeline_spark.operators.snapshots import (
        commit_snapshot,
        compact_snapshot,
    )

    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _grid(spark, 8))
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_snapshot(spark, t, zorder_by=["x"], cluster_by=["y"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_snapshot(spark, t, zorder_by=["x"], partition_by=["y"])
