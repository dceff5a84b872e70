"""Snapshot-table concurrency + hygiene hardening (round-7 ADVICE):

- full compaction must not drop a concurrent append (the lost-update
  window of a blind overwrite commit);
- merge discovery must be null-SAFE end-to-end (null key fields match,
  and stats pruning is disabled when the update batch carries them);
- vacuum liveness is decided by dir basename, not by string-equality of
  path spellings (file: URI vs bare path);
- committed_at is stamped per commit ATTEMPT so it stays monotonic in
  version across lost races (as-of resolution correctness);
- the stream high-water batch id is carried forward on every commit, so
  vacuuming the original stream-append manifests cannot re-open the
  exactly-once replay guard;
- the optimistic-concurrency claim holds across real OS processes, not
  just in-process monkeypatched races.
"""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, "/root/repo")

import binance_data_pipeline_spark.operators.snapshots as snap
from binance_data_pipeline_spark.operators.snapshots import (
    _list_versions,
    commit_snapshot,
    compact_snapshot,
    read_snapshot,
    snapshot_append_batch,
    snapshot_diff,
    snapshot_history,
    snapshot_merge,
    vacuum_snapshots,
)


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).selectExpr("id", f"'{tag}' as tag")


def test_full_compaction_keeps_concurrent_append(spark, tmp_path):
    """An append that commits between full compaction's source-set read
    and its version claim must survive BY REFERENCE in the compacted
    head — previously the full path committed a blind overwrite and the
    racer's rows vanished from latest."""
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 10, "base"))
    commit_snapshot(spark, t, _df(spark, 10, 20, "base"))

    real_list = snap._list_versions
    fired = {"done": False}

    def racing_list(s, table):
        vs = real_list(s, table)
        if not fired["done"]:
            fired["done"] = True
            commit_snapshot(s, table, _df(s, 100, 105, "racer"))
        return vs

    snap._list_versions = racing_list
    try:
        v = compact_snapshot(spark, t, target_file_mb=64)
    finally:
        snap._list_versions = real_list
    latest = read_snapshot(spark, t)
    assert latest.count() == 25
    assert {r["tag"] for r in latest.collect()} == {"base", "racer"}
    # linear history: base, base, racer, compact — no skipped numbers
    assert _list_versions(spark, t) == [0, 1, 2, 3]
    assert v == 3
    ops = {r["version"]: r["operation"] for r in snapshot_history(spark, t).collect()}
    assert ops[3].startswith("compact:")


def test_merge_null_key_matches_null_safe_with_stats_pruning(spark, tmp_path):
    """A NULL-keyed update must UPDATE the existing NULL-keyed row, not
    insert a duplicate — even when the NULL row lives in a dir whose
    key stats (min/max ignore NULLs) fall outside the update batch's
    non-null key range, the exact pre-fix miss."""
    t = str(tmp_path / "t")
    # dir A: keys 1..3; dir B: keys 10,11 plus ONE NULL-keyed row whose
    # stats read [10, 11] — the null match hides behind the stats prune
    a = spark.createDataFrame([(1, "a"), (2, "a"), (3, "a")], "k int, v string")
    b = spark.createDataFrame(
        [(10, "b"), (11, "b"), (None, "b")], "k int, v string"
    )
    commit_snapshot(spark, t, a, stats_cols=["k"])
    commit_snapshot(spark, t, b, stats_cols=["k"])

    upd = spark.createDataFrame([(None, "upd"), (2, "upd")], "k int, v string")
    v = snapshot_merge(spark, t, upd, key_cols=["k"])
    latest = read_snapshot(spark, t)
    assert latest.count() == 6  # no duplicate-null insert
    got = {
        (r["k"], r["v"])
        for r in latest.collect()
    }
    assert (None, "upd") in got and (2, "upd") in got
    assert (None, "b") not in got
    # the keyed diff's duplicate-key guard stays quiet across the merge
    d = snapshot_diff(spark, t, ["k"], 1, v)
    kinds = {
        (r["k"], r["_change_type"]) for r in d.collect()
    }
    assert (None, "update_postimage") in kinds and (2, "update_postimage") in kinds
    assert not any(ct == "insert" for _, ct in kinds)


def test_vacuum_uri_spelling_does_not_delete_live_dirs(spark, tmp_path):
    """vacuum called with a file: URI spelling of a table committed via
    bare paths must still see the live dir as referenced (basename
    identity), deleting only genuinely unreferenced dirs."""
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 10, "old"))
    commit_snapshot(spark, t, _df(spark, 0, 4, "live"), mode="overwrite")
    out = vacuum_snapshots(
        spark, "file:" + t, keep_versions=1, min_age_seconds=0.0
    )
    # old dir (unreferenced by the retained head) goes; live dir stays
    assert out["removed_data_dirs"] == 1
    latest = read_snapshot(spark, t)
    assert latest.count() == 4
    assert {r["tag"] for r in latest.collect()} == {"live"}


def test_committed_at_monotonic_across_lost_race(spark, tmp_path):
    """A race loser re-stamps committed_at on retry, so version order
    and commit-time order agree — as_of can never resolve to a version
    whose live set postdates the requested time."""
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 5, "base"))

    real_list = snap._list_versions
    fired = {"done": False}

    def racing_list(s, table):
        vs = real_list(s, table)
        if not fired["done"]:
            fired["done"] = True
            commit_snapshot(s, table, _df(s, 100, 103, "racer"))
        return vs

    snap._list_versions = racing_list
    try:
        commit_snapshot(spark, t, _df(spark, 200, 203, "late"))
    finally:
        snap._list_versions = real_list
    hist = snapshot_history(spark, t).orderBy("version").collect()
    times = [r["committed_at"] for r in hist]
    assert times == sorted(times)


def test_stream_hwm_survives_vacuum_of_stream_manifests(spark, tmp_path):
    """Exactly-once across checkpoint loss must hold even after vacuum
    reaps the original stream-append manifests: later commits carry the
    high-water batch id forward, so a replayed old batch still skips."""
    t = str(tmp_path / "t")
    assert snapshot_append_batch(spark, t, _df(spark, 0, 5, "b1"), 1) == 0
    assert snapshot_append_batch(spark, t, _df(spark, 5, 9, "b2"), 2) == 1
    # rows survive via a full compaction; stream manifests then age out
    compact_snapshot(spark, t, target_file_mb=64)
    vacuum_snapshots(spark, t, keep_versions=1, min_age_seconds=0.0)
    assert _list_versions(spark, t) == [2]
    # checkpoint-loss replay of batches 1 and 2: must be NO-OPs
    assert snapshot_append_batch(spark, t, _df(spark, 0, 5, "b1"), 1) is None
    assert snapshot_append_batch(spark, t, _df(spark, 5, 9, "b2"), 2) is None
    assert read_snapshot(spark, t).count() == 9
    # a genuinely new batch still lands
    assert snapshot_append_batch(spark, t, _df(spark, 9, 12, "b3"), 3) is not None
    assert read_snapshot(spark, t).count() == 12


_WORKER = r"""
import sys
sys.path.insert(0, "/root/repo")
from binance_data_pipeline_spark.session import get_spark
from binance_data_pipeline_spark.operators.snapshots import (
    commit_snapshot, snapshot_merge,
)
from pyspark.sql import functions as F

role, table, barrier = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark(f"race-{role}", master="local[2]", shuffle_partitions=2,
                  extra_conf={"spark.ui.enabled": "false"})
# rendezvous: wait until the peer's session is also up so commits overlap
import os, time
open(barrier + "." + role, "w").close()
deadline = time.time() + 120
others = [b for b in ("appender", "merger") if b != role]
while not all(os.path.exists(barrier + "." + o) for o in others):
    if time.time() > deadline:
        raise SystemExit("peer never arrived")
    time.sleep(0.2)

if role == "appender":
    for i in range(3):
        df = spark.range(100 + i * 10, 105 + i * 10).selectExpr(
            "id as k", "'app' as v")
        commit_snapshot(spark, table, df, max_retries=30)
elif role == "merger":
    for i in range(3):
        upd = spark.range(0, 10).selectExpr("id as k", f"'m{i}' as v")
        snapshot_merge(spark, table, upd, key_cols=["k"], max_retries=30)
spark.stop()
"""


def test_multiprocess_commit_and_merge_race_linear_history(spark, tmp_path):
    """Two real OS processes — one appending, one merging — race the
    same table through six commits. The version chain must come out
    contiguous with no lost rows: every appended key present exactly
    once, every base key carrying some merger's value, exactly once."""
    t = str(tmp_path / "race_t")
    base = spark.range(0, 10).selectExpr("id as k", "'base' as v")
    commit_snapshot(spark, t, base)

    barrier = str(tmp_path / "barrier")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, role, t, barrier],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for role in ("appender", "merger")
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    assert _list_versions(spark, t) == list(range(7))
    latest = read_snapshot(spark, t)
    rows = latest.collect()
    assert len(rows) == 25  # 10 base + 3×5 appended, no dupes, no losses
    ks = sorted(r["k"] for r in rows)
    assert ks == sorted(
        list(range(10)) + [100 + b * 10 + i for b in range(3) for i in range(5)]
    )
    base_vals = {r["v"] for r in rows if r["k"] < 100}
    assert base_vals <= {"m0", "m1", "m2"}  # every base row merged at least once
    app_vals = {r["v"] for r in rows if r["k"] >= 100}
    assert app_vals == {"app"}
