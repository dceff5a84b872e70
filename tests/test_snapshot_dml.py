"""Predicate DML on snapshot tables: DELETE FROM ... WHERE and
UPDATE ... SET ... WHERE as copy-on-write commits.

Contracts pinned here:
- SQL ternary semantics: TRUE-predicate rows delete/update, FALSE and
  NULL rows stay untouched;
- only dirs holding a matching row rewrite — the rest survive BY
  REFERENCE in the new manifest (the takedown-at-100TB posture);
- no match anywhere → no commit at all;
- history stays intact: the pre-DML version still time travels and
  snapshot_diff across the DML reports exactly the applied changes;
- UPDATE casts new values back to the column's type so the table keeps
  one schema, and refuses to invent columns.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.snapshots import (
    _list_versions,
    _live_dirs,
    commit_snapshot,
    read_snapshot,
    snapshot_delete,
    snapshot_diff,
    snapshot_history,
    snapshot_update,
)


def _mk(spark, t, tmp=None):
    # three dirs: domains a/b in dir0, c in dir1, d + NULL in dir2
    commit_snapshot(
        spark, t,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "id long, domain string, score double"
        ),
    )
    commit_snapshot(
        spark, t,
        spark.createDataFrame([(3, "c", 30.0)], "id long, domain string, score double"),
    )
    commit_snapshot(
        spark, t,
        spark.createDataFrame(
            [(4, "d", 40.0), (5, None, 50.0)], "id long, domain string, score double"
        ),
    )


def test_delete_rewrites_only_matching_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)
    before_dirs = set(_live_dirs(spark, t, 2))
    v = snapshot_delete(spark, t, "domain = 'c'")
    assert v == 3
    ops = {r["version"]: r["operation"] for r in snapshot_history(spark, t).collect()}
    assert ops[3] == "delete:1d"
    after_dirs = set(_live_dirs(spark, t, 3))
    # the two clean dirs survive by reference; the c-dir is replaced
    assert len(before_dirs & after_dirs) == 2
    got = sorted(r["id"] for r in read_snapshot(spark, t).collect())
    assert got == [1, 2, 4, 5]
    # NULL-predicate rows stayed (SQL DELETE keeps NULL), history intact
    assert read_snapshot(spark, t, version=2).count() == 5
    d = snapshot_diff(spark, t, ["id"], 2, 3).collect()
    assert [(r["id"], r["_change_type"]) for r in d] == [(3, "delete")]


def test_delete_no_match_commits_nothing(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)
    v = snapshot_delete(spark, t, F.col("domain") == "zzz")
    assert v == 2 and _list_versions(spark, t) == [0, 1, 2]


def test_update_where_predicate_and_type_cast(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)
    v = snapshot_update(
        spark, t, {"score": "score * 2"}, predicate="domain in ('a', 'c')"
    )
    assert v == 3
    ops = {r["version"]: r["operation"] for r in snapshot_history(spark, t).collect()}
    assert ops[3] == "update:2d"
    got = {r["id"]: r["score"] for r in read_snapshot(spark, t).collect()}
    assert got == {1: 20.0, 2: 20.0, 3: 60.0, 4: 40.0, 5: 50.0}
    # one schema across rewritten + untouched dirs
    assert dict(read_snapshot(spark, t).dtypes)["score"] == "double"
    # CDC across the update reports exactly the two changed keys
    d = snapshot_diff(spark, t, ["id"], 2, 3)
    pre = {r["id"] for r in d.where(F.col("_change_type") == "update_preimage").collect()}
    assert pre == {1, 3}


def test_update_rejects_new_columns_and_no_match(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)
    with pytest.raises(ValueError, match="cannot add columns"):
        snapshot_update(spark, t, {"brand_new": "1"})
    assert snapshot_update(spark, t, {"score": "0.0"}, predicate="id > 99") == 2
    assert _list_versions(spark, t) == [0, 1, 2]


def test_update_without_predicate_touches_all_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)
    v = snapshot_update(spark, t, {"score": F.col("score") + 1})
    assert v == 3
    got = {r["id"]: r["score"] for r in read_snapshot(spark, t).collect()}
    assert got == {1: 11.0, 2: 21.0, 3: 31.0, 4: 41.0, 5: 51.0}


# ---------------------------------------------------------------------------
# round 8: replaceWhere (atomic region replacement / dbt insert_overwrite)
# ---------------------------------------------------------------------------


def test_replace_where_atomic_partition_swap(spark, tmp_path):
    """One commit replaces the predicate region with the new rows:
    untouched dirs survive BY REFERENCE, the region's old rows are gone,
    the new rows are in, and history shows a single version."""
    from binance_data_pipeline_spark.operators.snapshots import (
        snapshot_replace_where,
    )

    t = str(tmp_path / "t")
    _mk(spark, t)
    before_dirs = set(_live_dirs(spark, t, _list_versions(spark, t)[-1]))
    repl = spark.createDataFrame(
        [(30, "c", 300.0), (31, "c", 301.0)], "id long, domain string, score double"
    )
    v = snapshot_replace_where(spark, t, F.col("domain") == "c", repl)
    assert v == _list_versions(spark, t)[-1]
    got = {r["id"]: (r["domain"], r["score"]) for r in read_snapshot(spark, t).collect()}
    assert 3 not in got and got[30] == ("c", 300.0) and got[31] == ("c", 301.0)
    assert got[1] == ("a", 10.0) and got[2] == ("b", 20.0)  # untouched rows intact
    after_dirs = set(_live_dirs(spark, t, v))
    # dirs without a matching row ride by reference (no rewrite)
    assert len(before_dirs & after_dirs) >= 1


def test_replace_where_contract_and_no_match_append(spark, tmp_path):
    """Incoming rows OUTSIDE the predicate abort (Delta's replaceWhere
    contract; non-idempotent otherwise); a predicate matching no live
    dir degrades to a plain append."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from binance_data_pipeline_spark.operators.snapshots import (
        snapshot_replace_where,
    )

    t = str(tmp_path / "t")
    _mk(spark, t)
    bad = spark.createDataFrame(
        [(99, "z", 9.0)], "id long, domain string, score double"
    )
    with pytest.raises(Exception, match="outside the predicate"):
        snapshot_replace_where(spark, t, F.col("domain") == "c", bad)
    # no live row matches domain 'zzz' -> plain append of matching rows
    new = spark.createDataFrame(
        [(50, "zzz", 5.0)], "id long, domain string, score double"
    )
    v = snapshot_replace_where(spark, t, F.col("domain") == "zzz", new)
    got = {r["id"] for r in read_snapshot(spark, t).collect()}
    assert 50 in got and {1, 2, 3} <= got
    assert v == _list_versions(spark, t)[-1]


def test_replace_where_is_a_rewrite_crossing_for_the_change_feed(spark, tmp_path):
    """snapshot_changes must refuse ranges crossing a replace_where —
    dir-diff stops meaning row inserts there (same contract as
    overwrite/compaction/DML), so consumers resync instead of silently
    double-counting the replaced region."""
    from binance_data_pipeline_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_replace_where,
    )

    t = str(tmp_path / "t")
    _mk(spark, t)
    head = _list_versions(spark, t)[-1]
    repl = spark.createDataFrame(
        [(30, "c", 300.0)], "id long, domain string, score double"
    )
    v = snapshot_replace_where(spark, t, F.col("domain") == "c", repl)
    with pytest.raises(ValueError, match="rewrite|superset|resync"):
        snapshot_changes(spark, t, head, v)


def test_replace_where_schema_enforcement_and_evolution(spark, tmp_path):
    """replace_where enforces write-side schema like every commit: a
    new column is rejected without evolution intent, type conflicts
    always reject, and evolve_schema=True commits AND evolves the
    manifest's recorded table schema (without that, the new column
    landed in the data dir while the manifest schema stayed old, so
    plain reads silently dropped it — the nondeterminism sql_models
    warns about)."""
    from binance_data_pipeline_spark.operators.snapshots import (
        snapshot_replace_where,
        table_schema,
    )

    t = str(tmp_path / "t")
    _mk(spark, t)
    plus = spark.createDataFrame(
        [(30, "c", 300.0, "x")],
        "id long, domain string, score double, extra string",
    )
    with pytest.raises(ValueError, match="schema enforcement"):
        snapshot_replace_where(spark, t, F.col("domain") == "c", plus)
    bad = spark.createDataFrame(
        [(31, "c", 300)], "id long, domain string, score long"
    )
    with pytest.raises(ValueError, match="type conflict"):
        snapshot_replace_where(spark, t, F.col("domain") == "c", bad)
    # nothing committed by the rejected attempts
    head_before = _list_versions(spark, t)[-1]
    v = snapshot_replace_where(
        spark, t, F.col("domain") == "c", plus, evolve_schema=True
    )
    assert v == head_before + 1
    assert "extra" in table_schema(spark, t, v).fieldNames()
    got = {
        r["id"]: r["extra"]
        for r in read_snapshot(spark, t, merge_schema=True).collect()
    }
    assert got[30] == "x" and got[1] is None and 3 not in got
