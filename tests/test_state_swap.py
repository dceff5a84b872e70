"""Crash safety of the shared merge-state machinery (operators/state_swap.py).

The swap protocol is rename-aside (dest -> dest__prev, tmp -> dest,
delete __prev), never delete-then-rename, so every crash point leaves a
complete committed state recoverable. These tests drive each crash
window by hand with os-level renames (local FS — same rename semantics
the Hadoop RawLocalFileSystem uses)."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.state_swap import (
    merge_state_batch,
    read_state,
)


def _merge_values(spark, state, values, batch_id=None):
    """Fold a batch of (key, v) rows into a sum-per-key state."""

    def build():
        return spark.createDataFrame(values, "key string, v long").groupBy(
            "key"
        ).agg(F.sum("v").alias("v"))

    def merge(union):
        return union.groupBy("key").agg(F.sum("v").alias("v"))

    merge_state_batch(spark, state, build, merge, batch_id=batch_id)


def _state_dict(spark, state):
    return {r["key"]: r["v"] for r in read_state(spark, state).collect()}


def test_merge_then_replay_skips(spark, tmp_path):
    state = str(tmp_path / "st")
    _merge_values(spark, state, [("a", 1)], batch_id=0)
    _merge_values(spark, state, [("a", 2), ("b", 5)], batch_id=1)
    _merge_values(spark, state, [("a", 100)], batch_id=1)  # replay: no-op
    assert _state_dict(spark, state) == {"a": 3, "b": 5}


def test_adhoc_merge_preserves_committed_batch_id(spark, tmp_path):
    """batch_id=None merges must carry the prior committed id forward —
    a later checkpoint replay of an already-applied batch still skips."""
    state = str(tmp_path / "st")
    _merge_values(spark, state, [("a", 1)], batch_id=7)
    _merge_values(spark, state, [("b", 2)], batch_id=None)  # ad-hoc
    _merge_values(spark, state, [("a", 50)], batch_id=7)  # replay: must skip
    assert _state_dict(spark, state) == {"a": 1, "b": 2}


def test_recover_from_crash_between_aside_and_commit(spark, tmp_path):
    """Crash window: live state renamed aside, new state not yet in place.
    dest is missing, __prev holds the committed state — both read and the
    next merge must recover it, losing nothing."""
    state = str(tmp_path / "st")
    _merge_values(spark, state, [("a", 1), ("b", 2)], batch_id=0)
    os.rename(state, f"{state}__prev")  # simulate the torn swap

    assert _state_dict(spark, state) == {"a": 1, "b": 2}  # read recovers
    _merge_values(spark, state, [("a", 10)], batch_id=1)  # merge sees history
    assert _state_dict(spark, state) == {"a": 11, "b": 2}
    assert not os.path.exists(f"{state}__prev")


def test_stale_prev_after_committed_swap_is_dropped(spark, tmp_path):
    """Crash window: new state committed, __prev cleanup not reached.
    dest is authoritative; the leftover __prev must be ignored and
    cleaned up by the next merge."""
    state = str(tmp_path / "st")
    _merge_values(spark, state, [("a", 1)], batch_id=0)
    shutil.copytree(state, f"{state}__prev")  # stale leftover

    assert _state_dict(spark, state) == {"a": 1}
    _merge_values(spark, state, [("a", 2)], batch_id=1)
    assert _state_dict(spark, state) == {"a": 3}
    assert not os.path.exists(f"{state}__prev")


def test_replay_guard_survives_torn_swap(spark, tmp_path):
    """The committed batch id travels with the recovered state: a replay
    of the last committed batch after a torn swap still skips."""
    state = str(tmp_path / "st")
    _merge_values(spark, state, [("a", 1)], batch_id=3)
    os.rename(state, f"{state}__prev")

    _merge_values(spark, state, [("a", 99)], batch_id=3)  # replay: skip
    assert _state_dict(spark, state) == {"a": 1}
