"""O(1) head lookup via the `_HEAD` hint file (VERDICT r10 task 2).

`_list_versions` is an O(#versions) directory listing — fine at v100,
wrong for 10k-commit tables. Every successful manifest claim now drops
a `versions/_HEAD` hint; `_head_version` reads it and probes FORWARD,
falling back to the full listing when the hint is missing (legacy
tables), stale (racer wrote out of order), or corrupt (crash mid-write).
The hint can therefore never produce a WRONG head — only extra probes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from binance_data_pipeline_spark.operators.snapshots import (
    _head_hint_path,
    _head_version,
    _list_versions,
    commit_snapshot,
    read_snapshot,
    snapshot_delete,
)
from binance_data_pipeline_spark.sources import snapshot_source as SRC


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id as k", "cast(id * 2 as long) as v")


def _mk_table(spark, tmp_path, n=3) -> str:
    t = str(tmp_path / "t")
    for i in range(n):
        commit_snapshot(spark, t, _df(spark, i * 10, i * 10 + 5))
    return t


def test_hint_written_at_commit_and_read_back(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    hint = _head_hint_path(t)
    assert os.path.exists(hint)
    assert open(hint).read().strip() == "2"
    assert _head_version(spark, t) == 2 == _list_versions(spark, t)[-1]


def test_legacy_table_without_hint_falls_back_and_upgrades(spark, tmp_path):
    """A table written by the pre-hint library has no _HEAD: head lookup
    must fall back to the listing, and the NEXT commit writes the hint."""
    t = _mk_table(spark, tmp_path)
    os.remove(_head_hint_path(t))
    assert _head_version(spark, t) == 2
    assert read_snapshot(spark, t).count() == 15  # default-head read path
    commit_snapshot(spark, t, _df(spark, 100, 105))
    assert open(_head_hint_path(t)).read().strip() == "3"
    assert _head_version(spark, t) == 3


def test_stale_low_hint_probes_forward(spark, tmp_path):
    """An out-of-order racer can regress the hint; readers must probe
    forward past it to the true head, never trust it verbatim."""
    t = _mk_table(spark, tmp_path, n=4)
    with open(_head_hint_path(t), "w") as fh:
        fh.write("0")
    assert _head_version(spark, t) == 3


def test_invalid_hints_fall_back_to_listing(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    for junk in ("garbage", "", "99", "-5"):
        with open(_head_hint_path(t), "w") as fh:
            fh.write(junk)
        assert _head_version(spark, t) == 2, f"hint={junk!r}"
        assert read_snapshot(spark, t).count() == 15
    # and the table still commits + repairs the hint afterwards
    commit_snapshot(spark, t, _df(spark, 200, 201))
    assert open(_head_hint_path(t)).read().strip() == "3"


def test_empty_table_head_is_none(spark, tmp_path):
    assert _head_version(spark, str(tmp_path / "nope")) is None


def test_dml_maintains_hint(spark, tmp_path):
    """Copy-on-write DML goes through the same manifest claim, so the
    hint tracks it too."""
    from pyspark.sql import functions as F

    t = _mk_table(spark, tmp_path)
    snapshot_delete(spark, t, F.col("k") < 2)
    assert open(_head_hint_path(t)).read().strip() == "3"
    assert _head_version(spark, t) == 3


def test_streaming_source_head_reader_matches(spark, tmp_path):
    """The pyarrow-side reader (sources/snapshot_source.py) resolves the
    same head with and without the hint — latestOffset polls this every
    trigger."""
    t = _mk_table(spark, tmp_path)
    assert SRC._head_version(t) == 2
    os.remove(_head_hint_path(t))
    assert SRC._head_version(t) == 2
    with open(_head_hint_path(t), "w") as fh:
        fh.write("1")  # stale-low: probe forward
    assert SRC._head_version(t) == 2


def test_commit_phase_sink_records_all_phases(spark, tmp_path):
    """The permanent phase instrumentation (VERDICT r10 task 2): with the
    sink enabled, every successful commit appends one record naming all
    six phases; disabled, commits append nothing."""
    from binance_data_pipeline_spark.operators import snapshots as SN

    t = str(tmp_path / "t")
    SN._PHASE_SINK = sink = []
    try:
        for i in range(3):
            commit_snapshot(spark, t, _df(spark, i, i + 2), stats_cols=["k"])
    finally:
        SN._PHASE_SINK = None
    assert len(sink) == 3
    want = {"pre_sec", "data_write_sec", "head_sec", "stats_sec",
            "hwm_sec", "manifest_sec"}
    assert all(set(p) == want for p in sink)
    assert all(v >= 0 for p in sink for v in p.values())
    commit_snapshot(spark, t, _df(spark, 50, 51))
    assert len(sink) == 3  # disabled sink stays untouched
