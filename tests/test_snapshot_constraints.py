"""Write-side guarantees for snapshot tables: CHECK constraints enforced
inside the write plan (commit / merge / predicate DML), ADD-CONSTRAINT
validation of existing data, and schema enforcement on append commits
with explicit evolution intent.

The reference's warehouse has neither (blind WRITE_APPEND,
airflow/dags/ingest_binance_last_3_days.py:85-103); this is the
Delta-style write contract the snapshot tier needs to be trustworthy:
a violating or schema-breaking write ABORTS before any version is
claimed — the table never goes bad, and readers never see a half-commit.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException

from binance_data_pipeline_spark.operators.snapshots import (
    _list_versions,
    commit_snapshot,
    drop_snapshot_constraint,
    get_snapshot_constraints,
    read_snapshot,
    set_snapshot_constraints,
    snapshot_delete,
    snapshot_merge,
    snapshot_update,
    table_schema,
    vacuum_snapshots,
)


def _df(spark, lo, hi, qty=1):
    return spark.range(lo, hi).selectExpr(
        "id", f"cast({qty} as int) as qty", "'x' as tag"
    )


def _violates(excinfo, name):
    return f"constraint {name!r} violated" in str(excinfo.value)


def test_set_get_drop_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 5))
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    set_snapshot_constraints(spark, t, {"id_nn": "id IS NOT NULL"})
    assert get_snapshot_constraints(spark, t) == {
        "qty_pos": "qty > 0",
        "id_nn": "id IS NOT NULL",
    }
    assert drop_snapshot_constraint(spark, t, "qty_pos") == {
        "id_nn": "id IS NOT NULL"
    }
    with pytest.raises(ValueError, match="no constraint"):
        drop_snapshot_constraint(spark, t, "nope")


def test_violating_append_aborts_without_claiming_a_version(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 5))
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    head = _list_versions(spark, t)[-1]
    with pytest.raises(SparkRuntimeException) as e:
        commit_snapshot(spark, t, _df(spark, 5, 8, qty=-1))
    assert _violates(e, "qty_pos")
    # no version claimed, table state untouched, orphan dir invisible
    assert _list_versions(spark, t)[-1] == head
    assert read_snapshot(spark, t).count() == 5


def test_compliant_append_passes_and_null_passes_check(spark, tmp_path):
    # SQL CHECK semantics: NULL expression result is a pass
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    nullq = spark.range(3, 6).selectExpr(
        "id", "cast(null as int) as qty", "'x' as tag"
    )
    commit_snapshot(spark, t, nullq)
    assert read_snapshot(spark, t).count() == 6


def test_missing_column_append_evaluates_as_null_and_passes(spark, tmp_path):
    # an append omitting a constrained column commits rows that read
    # back as NULL — the constraint must see them the same way
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    commit_snapshot(spark, t, spark.range(3, 5).selectExpr("id", "'y' as tag"))
    assert read_snapshot(spark, t, merge_schema=True).count() == 5


def test_add_constraint_validates_existing_data(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 5, qty=-2))
    with pytest.raises(ValueError, match="existing data.*violates"):
        set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    # refused sets are not activated
    assert get_snapshot_constraints(spark, t) == {}
    # validate=False enforces on future writes only
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"}, validate=False)
    with pytest.raises(SparkRuntimeException):
        commit_snapshot(spark, t, _df(spark, 5, 6, qty=-1))


def test_unresolvable_or_unparsable_constraint_fails_at_set_time(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))
    with pytest.raises(ValueError, match="does not resolve"):
        set_snapshot_constraints(spark, t, {"bad": "no_such_col > 0"})
    with pytest.raises(ValueError, match="does not parse"):
        set_snapshot_constraints(spark, t, {"bad": "qty > (("})
    assert get_snapshot_constraints(spark, t) == {}


def test_merge_enforces_constraints_on_updates_and_inserts(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 5))
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    head = _list_versions(spark, t)[-1]
    bad = spark.range(3, 7).selectExpr(
        "id", "cast(-9 as int) as qty", "'u' as tag"
    )
    with pytest.raises(SparkRuntimeException) as e:
        snapshot_merge(spark, t, bad, ["id"])
    assert _violates(e, "qty_pos")
    assert _list_versions(spark, t)[-1] == head
    good = spark.range(3, 7).selectExpr(
        "id", "cast(9 as int) as qty", "'u' as tag"
    )
    snapshot_merge(spark, t, good, ["id"])
    got = read_snapshot(spark, t)
    assert got.count() == 7
    assert got.where("qty = 9").count() == 4


def test_predicate_update_enforces_constraints(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 5, qty=3))
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    with pytest.raises(SparkRuntimeException) as e:
        snapshot_update(spark, t, {"qty": "qty - 10"}, predicate="id >= 3")
    assert _violates(e, "qty_pos")
    assert read_snapshot(spark, t).where("qty = 3").count() == 5
    # deletes never create violations; they still work under constraints
    snapshot_delete(spark, t, "id >= 3")
    assert read_snapshot(spark, t).count() == 3


def test_constraints_survive_vacuum(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(4):
        commit_snapshot(spark, t, _df(spark, i * 3, i * 3 + 3))
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    vacuum_snapshots(spark, t, keep_versions=1, min_age_seconds=0)
    assert get_snapshot_constraints(spark, t) == {"qty_pos": "qty > 0"}
    with pytest.raises(SparkRuntimeException):
        commit_snapshot(spark, t, _df(spark, 100, 101, qty=-1))


def test_overwrite_dropping_constrained_column_blocks_later_writes_loudly(
    spark, tmp_path
):
    # an overwrite may drop a column an active constraint references;
    # the NEXT write must then fail naming the constraint, not with a
    # bare unresolved-column error
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    commit_snapshot(
        spark, t, spark.range(0, 2).selectExpr("id"), mode="overwrite"
    )
    with pytest.raises(ValueError, match="qty_pos.*no longer resolve"):
        commit_snapshot(spark, t, spark.range(2, 4).selectExpr("id"))
    drop_snapshot_constraint(spark, t, "qty_pos")
    commit_snapshot(spark, t, spark.range(2, 4).selectExpr("id"))
    assert read_snapshot(spark, t).count() == 4


def test_replace_swaps_the_whole_set(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))
    set_snapshot_constraints(spark, t, {"a": "qty > 0", "b": "id >= 0"})
    set_snapshot_constraints(spark, t, {"only": "qty < 100"}, replace=True)
    assert get_snapshot_constraints(spark, t) == {"only": "qty < 100"}


# --- schema enforcement -------------------------------------------------


def test_append_with_new_column_requires_evolution_intent(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, spark.range(0, 3).selectExpr("id"))
    with pytest.raises(ValueError, match="evolve_schema=True"):
        commit_snapshot(
            spark, t, spark.range(3, 5).selectExpr("id", "id * 2 as extra")
        )
    v = commit_snapshot(
        spark,
        t,
        spark.range(3, 5).selectExpr("id", "id * 2 as extra"),
        evolve_schema=True,
    )
    assert v == 1
    # the recorded schema now carries the evolved column
    assert {f.name for f in table_schema(spark, t).fields} == {"id", "extra"}


def test_append_with_type_conflict_always_rejected(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))  # qty int
    bad = spark.range(3, 5).selectExpr(
        "id", "cast(1.5 as double) as qty", "'x' as tag"
    )
    with pytest.raises(ValueError, match="type conflict"):
        commit_snapshot(spark, t, bad)
    with pytest.raises(ValueError, match="type conflict"):
        commit_snapshot(spark, t, bad, evolve_schema=True)  # not an override
    assert _list_versions(spark, t) == [0]


def test_overwrite_resets_schema(spark, tmp_path):
    # overwrite is a new table state: its schema becomes THE schema
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))
    commit_snapshot(
        spark,
        t,
        spark.range(0, 2).selectExpr("id", "cast(2.5 as double) as qty"),
        mode="overwrite",
    )
    types = {f.name: f.dataType.simpleString() for f in table_schema(spark, t).fields}
    assert types == {"id": "bigint", "qty": "double"}
    # and the reset schema now gates appends
    with pytest.raises(ValueError, match="type conflict"):
        commit_snapshot(spark, t, _df(spark, 5, 6))


def test_recorded_schema_matches_parquet_union_and_survives_restart(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))
    commit_snapshot(
        spark,
        t,
        spark.range(3, 4).selectExpr("id", "'z' as extra"),
        evolve_schema=True,
    )
    rec = {f.name: f.dataType.simpleString() for f in table_schema(spark, t).fields}
    par = {
        f.name: f.dataType.simpleString()
        for f in read_snapshot(spark, t, merge_schema=True).schema.fields
    }
    assert rec == par


def test_cli_constraints_and_schema(spark, tmp_path, capsys):
    """snapshot CLI: --set-constraint gates later --commit, --constraints
    and --schema print the metadata, --drop-constraint lifts the gate."""
    from binance_data_pipeline_spark.__main__ import main

    t = str(tmp_path / "t")
    good, bad = str(tmp_path / "g.parquet"), str(tmp_path / "b.parquet")
    _df(spark, 0, 5).write.parquet(good)
    _df(spark, 5, 8, qty=-1).write.parquet(bad)

    assert main(["snapshot", "--table", t, "--commit", good]) == 0
    assert main(["snapshot", "--table", t,
                 "--set-constraint", "qty_pos=qty > 0"]) == 0
    assert main(["snapshot", "--table", t, "--constraints"]) == 0
    out = capsys.readouterr().out
    assert "CHECK qty_pos: qty > 0" in out
    with pytest.raises(SparkRuntimeException):
        main(["snapshot", "--table", t, "--commit", bad])
    assert read_snapshot(spark, t).count() == 5
    assert main(["snapshot", "--table", t, "--drop-constraint", "qty_pos"]) == 0
    assert main(["snapshot", "--table", t, "--commit", bad]) == 0
    assert read_snapshot(spark, t).count() == 8
    assert main(["snapshot", "--table", t, "--schema"]) == 0
    out = capsys.readouterr().out
    assert "qty\tint" in out and "tag\tstring" in out


def test_missing_column_append_allowed_without_evolution(spark, tmp_path):
    # dropping columns from a commit is not evolution — readers see NULLs
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))
    commit_snapshot(spark, t, spark.range(3, 5).selectExpr("id"))
    df = read_snapshot(spark, t, merge_schema=True)
    assert df.where("tag IS NULL").count() == 2
    # recorded schema keeps the full column set
    assert {f.name for f in table_schema(spark, t).fields} == {
        "id",
        "qty",
        "tag",
    }


def test_streaming_append_enforces_constraints(spark, tmp_path):
    """Constraints gate streaming ingest too (snapshot_append_batch ->
    commit_snapshot): a violating micro-batch fails the query before any
    version is claimed; the table keeps serving its last good state."""
    from binance_data_pipeline_spark.operators.snapshots import (
        snapshot_append_batch,
    )

    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 3))
    set_snapshot_constraints(spark, t, {"qty_pos": "qty > 0"})
    assert snapshot_append_batch(spark, t, _df(spark, 3, 5), batch_id=1) == 1
    head = _list_versions(spark, t)[-1]
    with pytest.raises(SparkRuntimeException) as e:
        snapshot_append_batch(spark, t, _df(spark, 5, 7, qty=-4), batch_id=2)
    assert _violates(e, "qty_pos")
    assert _list_versions(spark, t)[-1] == head
    assert read_snapshot(spark, t).count() == 5
    # the retried (fixed) batch 2 still applies exactly once
    assert snapshot_append_batch(spark, t, _df(spark, 5, 7), batch_id=2) == head + 1
    assert snapshot_append_batch(spark, t, _df(spark, 5, 7), batch_id=2) is None
