"""Crash-window fault injection over the snapshot commit protocol.

The protocol's atomicity claim (snapshots.py `commit_snapshot` docstring:
"The data dir lands BEFORE the manifest rename, so a crash between the
two leaves an invisible orphan, never a half-visible commit") is pinned
here by KILLING the writer at each protocol step — the manifest-write
step, the version-claim step, the mid-DML commit, the mid-vacuum window
after the sidecar checkpoint — and asserting the three invariants a
100 TB deployment relies on after every crash:

1. readers at head see exactly the last committed state (no torn commit,
   no lost rows, unchanged version number);
2. a later, healthy writer succeeds at the next version (no poisoned
   table, no stuck lock — the protocol is lock-free by construction);
3. `vacuum_snapshots` reaps exactly the crash debris (orphan data dirs,
   orphan `__vtmp_` manifests) and nothing else.

Crashes are injected by monkeypatching the module-level protocol steps
(`_write_manifest_commit`, `_claim_version`) — the same functions every
commit path (append, MERGE, predicate DML, replace_where) funnels
through, so one injection point per step covers all writers.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import binance_data_pipeline_spark.operators.snapshots as S
from binance_data_pipeline_spark.operators.snapshots import (
    _list_versions,
    commit_snapshot,
    read_snapshot,
    snapshot_delete,
    snapshot_history,
    snapshot_merge,
    vacuum_snapshots,
)


def _rows(spark, t, version=None):
    return sorted(
        tuple(r) for r in read_snapshot(spark, t, version=version).collect()
    )


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"k{i}", float(i)) for i in range(lo, hi)],
        "id long, key string, score double",
    )


def _mk(spark, t, n_commits=2):
    for c in range(n_commits):
        commit_snapshot(spark, t, _df(spark, 10 * c, 10 * c + 5))


def _data_dirs(t):
    d = os.path.join(t, "data")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def _tmp_dirs(t):
    return sorted(n for n in os.listdir(t) if n.startswith("__vtmp_"))


class _Boom(RuntimeError):
    pass


def _raiser(*_a, **_k):
    raise _Boom("injected crash")


def test_crash_before_manifest_write_is_invisible_and_vacuumable(
    spark, tmp_path, monkeypatch
):
    """Kill the writer after the data dir lands but before the manifest
    is even written: the commit must be invisible, the orphan dir
    reaped by vacuum, and the next healthy commit unaffected."""
    t = str(tmp_path / "t")
    _mk(spark, t)
    head = _list_versions(spark, t)[-1]
    before = _rows(spark, t)
    n_dirs = len(_data_dirs(t))

    monkeypatch.setattr(S, "_write_manifest_commit", _raiser)
    with pytest.raises(_Boom):
        commit_snapshot(spark, t, _df(spark, 100, 105))
    monkeypatch.undo()

    # invariant 1: nothing visible changed
    assert _list_versions(spark, t)[-1] == head
    assert _rows(spark, t) == before
    # the orphan data dir is on disk but referenced by no manifest
    assert len(_data_dirs(t)) == n_dirs + 1

    # invariant 3: vacuum reaps exactly the orphan (all manifests kept)
    res = vacuum_snapshots(spark, t, keep_versions=10, min_age_seconds=0.0)
    assert res["removed_data_dirs"] == 1
    assert res["removed_manifests"] == 0
    assert _rows(spark, t) == before

    # invariant 2: the next healthy commit takes the next version
    v = commit_snapshot(spark, t, _df(spark, 100, 105))
    assert v == head + 1
    assert len(_rows(spark, t)) == len(before) + 5


def test_crash_between_manifest_tmp_and_claim(spark, tmp_path, monkeypatch):
    """Kill the writer after the tmp manifest parquet is fully written
    but before the atomic rename claims the version: the table must be
    unchanged, the `__vtmp_` debris reaped by vacuum."""
    t = str(tmp_path / "t")
    _mk(spark, t)
    head = _list_versions(spark, t)[-1]
    before = _rows(spark, t)

    monkeypatch.setattr(S, "_claim_version", _raiser)
    with pytest.raises(_Boom):
        commit_snapshot(spark, t, _df(spark, 100, 105))
    monkeypatch.undo()

    assert _list_versions(spark, t)[-1] == head
    assert _rows(spark, t) == before
    assert len(_tmp_dirs(t)) == 1  # the unclaimed manifest

    res = vacuum_snapshots(spark, t, keep_versions=10, min_age_seconds=0.0)
    assert res["removed_tmp_dirs"] == 1
    assert res["removed_data_dirs"] == 1  # the orphan data dir too
    assert _tmp_dirs(t) == []
    assert _rows(spark, t) == before

    v = commit_snapshot(spark, t, _df(spark, 100, 105))
    assert v == head + 1


def test_crash_mid_merge_leaves_target_intact_and_retry_applies(
    spark, tmp_path, monkeypatch
):
    """MERGE is all-or-nothing: a crash at the claim step must leave the
    target bit-identical (matched rows NOT half-updated), and re-running
    the same merge afterwards applies it exactly once."""
    t = str(tmp_path / "t")
    _mk(spark, t)
    before = _rows(spark, t)
    head = _list_versions(spark, t)[-1]
    updates = spark.createDataFrame(
        [(1, "k1", 999.0), (777, "new", 7.0)], "id long, key string, score double"
    )

    monkeypatch.setattr(S, "_claim_version", _raiser)
    with pytest.raises(_Boom):
        snapshot_merge(spark, t, updates, key_cols=["id"])
    monkeypatch.undo()

    assert _rows(spark, t) == before
    assert _list_versions(spark, t)[-1] == head

    v = snapshot_merge(spark, t, updates, key_cols=["id"])
    assert v == head + 1
    after = dict((r[0], r[2]) for r in _rows(spark, t))
    assert after[1] == 999.0 and after[777] == 7.0
    assert len(after) == len(before) + 1


def test_crash_mid_delete_then_retry_is_exact(spark, tmp_path, monkeypatch):
    """Predicate DELETE through the same claim crash: no rows vanish on
    the crashed attempt; the retry deletes exactly the matching rows."""
    t = str(tmp_path / "t")
    _mk(spark, t)
    before = _rows(spark, t)
    head = _list_versions(spark, t)[-1]

    monkeypatch.setattr(S, "_claim_version", _raiser)
    with pytest.raises(_Boom):
        snapshot_delete(spark, t, F.col("id") < 3)
    monkeypatch.undo()

    assert _rows(spark, t) == before
    assert _list_versions(spark, t)[-1] == head

    snapshot_delete(spark, t, F.col("id") < 3)
    kept = _rows(spark, t)
    assert all(r[0] >= 3 for r in kept)
    assert len(kept) == len([r for r in before if r[0] >= 3])


def test_crash_mid_vacuum_after_sidecar_is_resumable(
    spark, tmp_path, monkeypatch
):
    """Vacuum writes the retention floor's sidecar checkpoint BEFORE any
    deletion; kill it in that window (sidecar on disk, nothing reaped
    yet). The table must read identically, history must be intact, and
    a re-run vacuum must complete with the same end state it would have
    reached in one pass — i.e. the crashed vacuum is a resumable no-op,
    not a torn one."""
    t = str(tmp_path / "t")
    # 14 commits: keep_versions=2 retains {v12, v13}; v12 is a DELTA
    # (checkpoint cadence 10), so the floor sidecar path is exercised.
    for c in range(14):
        commit_snapshot(spark, t, _df(spark, 10 * c, 10 * c + 3))
    versions = _list_versions(spark, t)
    assert versions[-1] == 13
    before = _rows(spark, t)
    before_v12 = _rows(spark, t, version=12)

    # crash AFTER the sidecar write, BEFORE liveness listing/deletion
    real_live_dirs = S._live_dirs
    calls = {"n": 0}

    def crash_on_liveness(spark_, table_, version_):
        calls["n"] += 1
        raise _Boom("injected crash")

    monkeypatch.setattr(S, "_live_dirs", crash_on_liveness)
    with pytest.raises(_Boom):
        vacuum_snapshots(spark, t, keep_versions=2, min_age_seconds=0.0)
    monkeypatch.setattr(S, "_live_dirs", real_live_dirs)
    assert calls["n"] == 1

    # nothing reaped; sidecar present; reads and time travel unchanged
    assert _list_versions(spark, t) == versions
    assert S._list_sidecar_ckpts(spark, t) == [12]
    assert _rows(spark, t) == before
    assert _rows(spark, t, version=12) == before_v12

    # the re-run completes and lands the one-pass end state
    res = vacuum_snapshots(spark, t, keep_versions=2, min_age_seconds=0.0)
    assert res["removed_manifests"] == 12
    assert _list_versions(spark, t) == [12, 13]
    assert _rows(spark, t) == before
    assert _rows(spark, t, version=12) == before_v12  # resolves via sidecar
    hist = snapshot_history(spark, t).collect()
    assert sorted(int(r["version"]) for r in hist) == [12, 13]


def test_repeated_crashes_then_success_numbers_versions_contiguously(
    spark, tmp_path, monkeypatch
):
    """Three writers crash in a row at different steps; the fourth
    succeeds. Version numbers stay contiguous (no burned versions — a
    crashed attempt claims nothing) and vacuum reports exactly the
    accumulated debris."""
    t = str(tmp_path / "t")
    _mk(spark, t, n_commits=1)
    head = _list_versions(spark, t)[-1]

    monkeypatch.setattr(S, "_write_manifest_commit", _raiser)
    with pytest.raises(_Boom):
        commit_snapshot(spark, t, _df(spark, 50, 55))
    monkeypatch.undo()
    monkeypatch.setattr(S, "_claim_version", _raiser)
    with pytest.raises(_Boom):
        commit_snapshot(spark, t, _df(spark, 60, 65))
    with pytest.raises(_Boom):
        snapshot_merge(
            spark,
            t,
            spark.createDataFrame([(0, "k0", -1.0)], "id long, key string, score double"),
            key_cols=["id"],
        )
    monkeypatch.undo()

    v = commit_snapshot(spark, t, _df(spark, 70, 75))
    assert v == head + 1  # contiguous: crashed attempts burned nothing

    res = vacuum_snapshots(spark, t, keep_versions=10, min_age_seconds=0.0)
    # 3 orphan data dirs (one per crashed writer), 2 orphan tmp manifests
    # (the _claim_version crashes; the first crash never wrote one)
    assert res["removed_data_dirs"] == 3
    assert res["removed_tmp_dirs"] == 2


def test_six_way_thread_contention_keeps_history_linear(spark, tmp_path):
    """Six in-process committers race 24 appends onto one table (the
    two-process race in test_snapshots_hardening pins the OS-level case;
    this pins HIGH contention crossing a checkpoint-cadence boundary).
    Required: contiguous versions, every row exactly once, and every
    version's manifest resolving against the correct checkpoint base."""
    from concurrent.futures import ThreadPoolExecutor

    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _df(spark, 0, 10))  # v0 (checkpoint)

    def work(thread_id):
        for c in range(4):
            lo = 1000 * (thread_id + 1) + 10 * c
            commit_snapshot(
                spark, t, _df(spark, lo, lo + 10), max_retries=50
            )

    with ThreadPoolExecutor(max_workers=6) as ex:
        list(ex.map(work, range(6)))

    versions = _list_versions(spark, t)
    assert versions == list(range(25))  # contiguous, nothing burned
    rows = _rows(spark, t)
    assert len(rows) == 10 + 24 * 10
    assert len({r[0] for r in rows}) == len(rows)  # exactly once

    # cadence integrity: v0/v10/v20 are checkpoints (base == self),
    # everything else a delta resolving to its cadence floor
    for v in versions:
        assert S._ckpt_base_of(spark, t, v) == (v // 10) * 10
    # every intermediate version's live set is version-monotone in size
    # (append-only history: one more dir per version)
    for v in (0, 5, 10, 17, 24):
        assert len(S._live_dirs(spark, t, v)) == v + 1


def test_tail_consumer_concurrent_with_committers_sees_exactly_once(
    spark, tmp_path
):
    """Read-while-write: a change-feed consumer tails the table WHILE
    three committer threads append. Every tail round anchors at a fully
    claimed head (atomic rename), so the consumer must end up with the
    exact final state — every key exactly once, no torn batch, no skipped
    range — without any coordination with the writers."""
    import threading
    import time as _time

    from binance_data_pipeline_spark.operators.snapshots import snapshot_tail

    t = str(tmp_path / "t")
    cursor = str(tmp_path / "cursor")
    commit_snapshot(spark, t, _df(spark, 0, 5))  # v0

    def committer(thread_id):
        for c in range(4):
            lo = 1000 * (thread_id + 1) + 10 * c
            commit_snapshot(spark, t, _df(spark, lo, lo + 5), max_retries=50)

    threads = [threading.Thread(target=committer, args=(i,)) for i in range(3)]
    for th in threads:
        th.start()

    seen: dict[int, int] = {}

    def process(batch, from_v, to_v, mode):
        for r in batch.collect():
            seen[r["id"]] = seen.get(r["id"], 0) + 1

    # tail while writers are live, then join and drain the remainder
    snapshot_tail(spark, t, cursor, process, max_rounds=8,
                  poll=lambda: _time.sleep(0.3))
    for th in threads:
        th.join()
    snapshot_tail(spark, t, cursor, process, max_rounds=1)

    final = {r[0] for r in _rows(spark, t)}
    assert set(seen) == final
    assert len(final) == 5 + 3 * 4 * 5
    dupes = {k: n for k, n in seen.items() if n != 1}
    assert not dupes, f"keys delivered more than once: {dupes}"
    assert _list_versions(spark, t) == list(range(13))


@pytest.mark.parametrize("seed", [11, 23])
def test_randomized_ops_with_crash_injection_match_model(
    spark, tmp_path, monkeypatch, seed
):
    """Seeded random op sequence (append/merge/delete) where ~1/3 of the
    ops crash at the version-claim step. A Python dict model applies
    ONLY the ops that succeeded; the table must equal the model exactly,
    with one contiguous version per successful op — crashed ops leave no
    trace a reader can see. Generalizes the fixed crash-window tests to
    arbitrary interleavings."""
    import random as _random

    from binance_data_pipeline_spark.operators.snapshots import snapshot_update

    rng = _random.Random(seed)
    t = str(tmp_path / "t")
    model: dict[int, float] = {}
    real_claim = S._claim_version

    def apply_op(op, crash):
        if crash:
            monkeypatch.setattr(S, "_claim_version", _raiser)
        try:
            if op[0] == "append":
                _, lo = op
                df = _df(spark, lo, lo + 4)
                commit_snapshot(spark, t, df)
                if not crash:
                    model.update({i: float(i) for i in range(lo, lo + 4)})
            elif op[0] == "merge":
                _, keys, val = op
                updates = spark.createDataFrame(
                    [(k, f"k{k}", val) for k in keys],
                    "id long, key string, score double",
                )
                snapshot_merge(spark, t, updates, key_cols=["id"])
                if not crash:
                    model.update({k: val for k in keys})
            else:  # delete
                _, cut = op
                matched = any(k < cut for k in model)
                snapshot_delete(spark, t, F.col("id") < cut)
                if not crash and matched:
                    for k in [k for k in model if k < cut]:
                        del model[k]
                return matched
        finally:
            if crash:
                monkeypatch.setattr(S, "_claim_version", real_claim)
        return True

    commit_snapshot(spark, t, _df(spark, 0, 4))  # v0
    model.update({i: float(i) for i in range(0, 4)})
    expected_versions = 1

    live_keys = lambda: sorted(model) or [0]
    for step in range(12):
        kind = rng.choice(["append", "merge", "delete"])
        if kind == "append":
            op = ("append", 100 * (step + 1))
        elif kind == "merge":
            ks = rng.sample(live_keys(), min(3, len(live_keys())))
            ks.append(9000 + step)  # one fresh insert key per merge
            op = ("merge", ks, round(rng.uniform(0, 100), 1))
        else:
            op = ("delete", rng.choice(live_keys()) + 1)
        crash = rng.random() < 0.34
        if crash:
            with pytest.raises(_Boom):
                apply_op(op, True)
        else:
            committed = apply_op(op, False)
            if committed:
                expected_versions += 1

    assert _list_versions(spark, t) == list(range(expected_versions))
    got = {r[0]: r[2] for r in _rows(spark, t)}
    assert got == model
