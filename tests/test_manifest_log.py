"""Delta-record manifest log: per-commit metadata cost is O(changed
dirs), not O(live dirs).

Round-8's 100x smokes measured the full-listing manifest growing
12.9-15.7x per commit as the live dir count grew — the one named
driver-side scale-killer. This file pins the Delta-log-shaped fix:

- append/merge/DML commits write DELTA manifests (one "add" row per
  new dir, one "remove" row per dropped dir);
- every ``_CKPT_EVERY``th version, plus overwrite/rollback/compact,
  writes a full-listing CHECKPOINT;
- readers resolve a delta against its recorded checkpoint ``base`` plus
  the deltas in between — bounded by the cadence, never the whole log;
- vacuum pins the retention floor as a SIDECAR checkpoint
  ({table}/ckpts/v{N}) before reaping the chain below it, so retained
  versions keep resolving and retention semantics are unchanged;
- history/time-travel/change-feed/stream-source semantics are
  identical across the format change.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.snapshots import (
    _CKPT_EVERY,
    _list_sidecar_ckpts,
    _list_versions,
    _live_entries,
    _read_manifest,
    commit_snapshot,
    read_snapshot,
    rollback_snapshot,
    snapshot_changes,
    snapshot_history,
    snapshot_merge,
    vacuum_snapshots,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 as v")


def _manifest_rows(spark, t, v):
    return _read_manifest(spark, t, v).collect()


def test_append_commits_write_delta_manifests_with_checkpoint_cadence(spark, tmp_path):
    """N appends: v0 and every _CKPT_EVERY-th version are full listings;
    everything between is a single-add delta — commit metadata no longer
    copies the whole live set (or its stats blobs) forward."""
    t = str(tmp_path / "t")
    n = _CKPT_EVERY + 3
    for i in range(n):
        commit_snapshot(spark, t, _df(spark, i * 10, (i + 1) * 10))
    for v in range(n):
        rows = _manifest_rows(spark, t, v)
        if v % _CKPT_EVERY == 0:
            assert len(rows) == v + 1, f"v{v} should be a checkpoint"
            assert all(r["base"] == v and r["action"] == "add" for r in rows)
        else:
            assert len(rows) == 1, f"v{v} should be a one-add delta"
            (r,) = rows
            assert r["action"] == "add"
            assert r["base"] == (v // _CKPT_EVERY) * _CKPT_EVERY
        # n_live records the LIVE count so history never needs resolution
        assert all(r["n_live"] == v + 1 for r in rows)
    # resolution: every version reads back its exact live prefix
    for v in (0, 1, _CKPT_EVERY - 1, _CKPT_EVERY, n - 1):
        assert read_snapshot(spark, t, version=v).count() == (v + 1) * 10
    hist = {r["version"]: r["n_dirs"] for r in snapshot_history(spark, t).collect()}
    assert hist == {v: v + 1 for v in range(n)}


def test_merge_and_rollback_across_delta_manifests(spark, tmp_path):
    """A merge writes add+remove delta rows (changed dirs only); a
    rollback writes a checkpoint (it replaces the live set); both read
    back exactly."""
    t = str(tmp_path / "t")
    for i in range(4):
        commit_snapshot(spark, t, _df(spark, i * 10, (i + 1) * 10))
    upd = spark.createDataFrame([(5, 999)], "id long, v long")
    v = snapshot_merge(spark, t, upd, key_cols=["id"])
    rows = _manifest_rows(spark, t, v)
    acts = sorted(r["action"] for r in rows)
    assert acts == ["add", "remove"]  # 1 touched dir out, 1 merged dir in
    got = {r["id"]: r["v"] for r in read_snapshot(spark, t).collect()}
    assert got[5] == 999 and got[6] == 12 and len(got) == 40
    rv = rollback_snapshot(spark, t, 3)
    rows = _manifest_rows(spark, t, rv)
    assert all(r["action"] == "add" and r["base"] == rv for r in rows)
    assert len(rows) == 4  # full listing of version 3's live set
    assert read_snapshot(spark, t).count() == 40
    assert {r["v"] for r in read_snapshot(spark, t).where("id = 5").collect()} == {10}


def test_change_feed_and_time_travel_unchanged_across_deltas(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(_CKPT_EVERY + 2):
        commit_snapshot(spark, t, _df(spark, i * 10, (i + 1) * 10))
    # a range spanning the checkpoint boundary is still an exact feed
    feed = snapshot_changes(spark, t, _CKPT_EVERY - 2, _CKPT_EVERY + 1)
    assert feed.count() == 30
    assert feed.agg(F.min("id")).first()[0] == (_CKPT_EVERY - 1) * 10


def test_vacuum_writes_sidecar_checkpoint_and_retention_is_exact(spark, tmp_path):
    """Vacuum reaps manifests below the floor EXACTLY as before (no
    closure creep) by pinning the floor version's live listing as a
    sidecar checkpoint; retained versions resolve through it, new
    commits chain onto it, and a second vacuum rolls the floor
    forward."""
    t = str(tmp_path / "t")
    n = _CKPT_EVERY - 2  # all-but-v0 are deltas: the worst case
    for i in range(n):
        commit_snapshot(spark, t, _df(spark, i * 10, (i + 1) * 10))
    out = vacuum_snapshots(spark, t, keep_versions=2, min_age_seconds=0)
    assert out["removed_manifests"] == n - 2
    assert out["retained_versions"] == 2
    assert _list_versions(spark, t) == [n - 2, n - 1]
    assert _list_sidecar_ckpts(spark, t) == [n - 2]
    # both retained versions resolve exactly, via the sidecar
    assert read_snapshot(spark, t, version=n - 2).count() == (n - 1) * 10
    assert read_snapshot(spark, t).count() == n * 10
    # reaped history is gone (time travel beyond the window: vacuumed)
    with pytest.raises(ValueError, match="not in"):
        read_snapshot(spark, t, version=0)
    # new commits chain onto the sidecar-backed base and resolve
    commit_snapshot(spark, t, _df(spark, n * 10, (n + 1) * 10))
    assert read_snapshot(spark, t).count() == (n + 1) * 10
    feed = snapshot_changes(spark, t, n - 1, n)
    assert feed.count() == 10
    # floor rolls forward; the stale sidecar is reaped with it
    out2 = vacuum_snapshots(spark, t, keep_versions=2, min_age_seconds=0)
    assert out2["removed_manifests"] == 1
    assert _list_sidecar_ckpts(spark, t) == [n - 1]
    assert read_snapshot(spark, t).count() == (n + 1) * 10
    # dry_run reports without writing a sidecar or deleting anything
    t2 = str(tmp_path / "t2")
    for i in range(3):
        commit_snapshot(spark, t2, _df(spark, i * 10, (i + 1) * 10))
    out3 = vacuum_snapshots(spark, t2, keep_versions=1, min_age_seconds=0,
                            dry_run=True)
    assert out3["dry_run"] and _list_sidecar_ckpts(spark, t2) == []
    assert _list_versions(spark, t2) == [0, 1, 2]


def test_snapshot_source_resolves_delta_manifests_and_sidecars(spark, tmp_path):
    """The pyarrow-side resolver (no SparkSession inside a DataSource)
    mirrors _live_state: deltas against checkpoint base, sidecar
    shortcut after vacuum."""
    from binance_data_pipeline_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    n = _CKPT_EVERY - 3
    for i in range(n):
        commit_snapshot(spark, t, _df(spark, i * 10, (i + 1) * 10))
    got = spark.read.format("snapshot_table").option("path", t).load()
    assert got.count() == n * 10
    vacuum_snapshots(spark, t, keep_versions=2, min_age_seconds=0)
    got = spark.read.format("snapshot_table").option("path", t).load()
    assert got.count() == n * 10
    assert got.agg(F.sum("id")).first()[0] == sum(range(n * 10))


def test_live_entries_keep_stats_across_delta_chains(spark, tmp_path):
    """Per-dir stats ride the add rows and survive resolution — range
    pruning must keep working when the live set spans checkpoint and
    delta manifests."""
    t = str(tmp_path / "t")
    for i in range(4):
        commit_snapshot(
            spark, t, _df(spark, i * 10, (i + 1) * 10), stats_cols=["id"]
        )
    entries = _live_entries(spark, t, 3)
    assert len(entries) == 4
    assert all(s is not None and '"id"' in s for _p, s in entries)


def _legacyify(spark, t):
    """Rewrite every manifest of ``t`` into the PRE-round-9 format: a
    full live listing per version WITHOUT the action/base/n_live
    columns — exactly what tables written by the old library look like
    on disk. The upgrade contract: the new code must read them, commit
    delta manifests ON TOP of them, and vacuum across the boundary."""
    import uuid as _uuid

    from binance_data_pipeline_spark.operators.snapshots import (
        _claim_version, _hadoop_fs, _live_entries, _vname, _versions_dir,
    )

    for v in _list_versions(spark, t):
        entries = _live_entries(spark, t, v)
        m = _read_manifest(spark, t, v).select(
            "version", "operation", "committed_at", "stream_hwm",
            "table_schema").first()
        rows = [
            (p, int(m["version"]), m["operation"], float(m["committed_at"]),
             s, m["stream_hwm"], m["table_schema"])
            for p, s in entries
        ]
        tmp = f"{t}/__vtmp_{_uuid.uuid4().hex[:12]}"
        spark.createDataFrame(
            rows,
            "path string, version long, operation string,"
            " committed_at double, stats string, stream_hwm long,"
            " table_schema string",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        dest = f"{_versions_dir(t)}/{_vname(v)}"
        fs, dp = _hadoop_fs(spark, dest)
        fs.delete(dp, True)
        assert _claim_version(spark, tmp, dest)


def test_legacy_format_tables_read_and_upgrade_in_place(spark, tmp_path):
    """A table written by the pre-delta-format library (full-listing
    manifests, no action/base columns) must keep working verbatim under
    the new code: reads, history, time travel, NEW delta commits on top
    (resolving across the mixed legacy/delta chain), merge, and vacuum
    across the format boundary."""
    t = str(tmp_path / "t")
    for c in range(3):
        commit_snapshot(
            spark, t,
            spark.range(10 * c, 10 * c + 5).selectExpr("id as k", "'old' as v"),
        )
    _legacyify(spark, t)

    # legacy reads: full state, per-version time travel, history
    assert read_snapshot(spark, t).count() == 15
    assert read_snapshot(spark, t, version=1).count() == 10
    assert snapshot_history(spark, t).count() == 3
    mdf = _read_manifest(spark, t, 2)
    assert "base" not in mdf.columns  # genuinely old format on disk

    # new commits land as DELTAS resolving against the legacy base
    v3 = commit_snapshot(
        spark, t, spark.range(100, 104).selectExpr("id as k", "'new' as v"))
    assert v3 == 3
    m3 = _read_manifest(spark, t, 3)
    assert "base" in m3.columns
    assert m3.where(F.col("action") == "add").count() == 1  # a delta, not a listing
    assert read_snapshot(spark, t).count() == 19
    assert read_snapshot(spark, t, version=2).count() == 15  # legacy still travels

    # a merge (rewrite) across the boundary
    snapshot_merge(
        spark, t,
        spark.range(0, 2).selectExpr("id as k", "'merged' as v"),
        key_cols=["k"],
    )
    rows = {r["k"]: r["v"] for r in read_snapshot(spark, t).collect()}
    assert rows[0] == rows[1] == "merged" and rows[100] == "new"
    assert len(rows) == 19

    # vacuum across the mixed chain: keep the last two, everything reads
    res = vacuum_snapshots(spark, t, keep_versions=2, min_age_seconds=0.0)
    assert res["retained_versions"] == 2
    assert _list_versions(spark, t) == [3, 4]
    assert read_snapshot(spark, t).count() == 19
    assert read_snapshot(spark, t, version=3).count() == 19
