"""Manifest Bloom-filter indexes for snapshot tables.

Min/max manifest stats cannot prune dirs for high-cardinality UNSORTED
keys — every dir's [min,max] spans the key space, so a 100 TB MERGE by
uuid key scans every live dir for discovery. A per-dir Bloom filter
recorded beside the stats bounds discovery (and point lookups) to dirs
that can actually contain the probed keys:

- recorded at commit (``bloom_cols``), inherited by later stats-less
  writers and carried through merge/compact rewrites, like min/max;
- probe = the same JVM xxhash64 expressions, an Arrow kernel testing
  all dirs' bitmaps per batch, driver transfer bounded by dir count;
- superset-exact under NULL keys (NULL hashes consistently on both
  sides — the min/max prune must disable itself there), under type
  drift (mismatched build type → bloom unusable → dir kept), and under
  saturation (all bits set → prunes nothing, never wrongly skips).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.snapshots import (
    _bloom_prune_dirs,
    _live_entries,
    _list_versions,
    commit_snapshot,
    compact_snapshot,
    read_snapshot,
    snapshot_history,
    snapshot_lookup,
    snapshot_merge,
)

_BLOOM = "__bloom__"


def _keys_df(spark, tag, n=60):
    # interleaved string keys: per-dir [min,max] ranges all overlap, so
    # range stats can never separate the dirs — only the bloom can
    return spark.createDataFrame(
        [(f"k{i:04d}{tag}", f"v-{tag}-{i}") for i in range(n)], "id string, val string"
    )


def _blooms_of(spark, table, version=None):
    v = _list_versions(spark, table)[-1] if version is None else version
    out = {}
    for path, s in _live_entries(spark, table, v):
        out[path] = (json.loads(s).get(_BLOOM) if s else None) or {}
    return out


def test_bloom_recorded_and_inherited(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(
        spark, t, _keys_df(spark, "a"), stats_cols=["id"], bloom_cols=["id"],
        bloom_bits=1 << 12, bloom_hashes=4,
    )
    # a later bloom-unaware writer inherits the column set AND params
    commit_snapshot(spark, t, _keys_df(spark, "b"))
    for path, bl in _blooms_of(spark, t).items():
        assert set(bl) == {"id"}, path
        assert bl["id"]["m"] == 1 << 12 and bl["id"]["k"] == 4
        assert bl["id"]["t"] == "string" and bl["id"]["b64"]
    # min/max stats still recorded beside the bloom
    entries = _live_entries(spark, t, _list_versions(spark, t)[-1])
    assert all("id" in json.loads(s) for _, s in entries)


def test_bloom_prunes_merge_discovery_to_true_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _keys_df(spark, "a"), bloom_cols=["id"])
    commit_snapshot(spark, t, _keys_df(spark, "b"))
    commit_snapshot(spark, t, _keys_df(spark, "c"))
    entries = _live_entries(spark, t, _list_versions(spark, t)[-1])
    # range stats are useless here: every update key sits inside every
    # dir's [min,max]; the bloom alone identifies the one true dir
    upd = spark.createDataFrame(
        [("k0030b", "UPDATED")], "id string, val string"
    )
    dirs = _bloom_prune_dirs(upd, ["id"], entries)
    tags = sorted(
        read_snapshot(spark, t).limit(0).sparkSession.read.parquet(d)
        .select(F.substring("id", 6, 1)).distinct().first()[0]
        for d in dirs
    )
    assert tags == ["b"], tags
    # end-to-end: the merge rewrites exactly one dir and is correct
    v = snapshot_merge(spark, t, upd, ["id"])
    ops = {
        int(r["version"]): r["operation"]
        for r in snapshot_history(spark, t).collect()
    }
    assert ops[v] == "merge:1d"
    got = read_snapshot(spark, t).where(F.col("id") == "k0030b").collect()
    assert [r["val"] for r in got] == ["UPDATED"]
    assert read_snapshot(spark, t).count() == 180


def test_bloom_null_keys_consistent(spark, tmp_path):
    t = str(tmp_path / "t")
    with_null = spark.createDataFrame(
        [(None, "nullrow"), ("x1", "a")], "id string, val string"
    )
    commit_snapshot(spark, t, with_null, bloom_cols=["id"])
    commit_snapshot(spark, t, _keys_df(spark, "z"))
    entries = _live_entries(spark, t, _list_versions(spark, t)[-1])
    upd = spark.createDataFrame([(None, "NULL-UPD")], "id string, val string")
    dirs = _bloom_prune_dirs(upd, ["id"], entries)
    # the NULL-keyed dir is kept (NULL hashes consistently), the other
    # dir — which range stats could NOT prune (min/max ignore NULLs and
    # the update's range is empty) — is bloom-pruned
    assert len(dirs) == 1
    v = snapshot_merge(spark, t, upd, ["id"])
    got = read_snapshot(spark, t, version=v).where(F.col("id").isNull()).collect()
    assert [r["val"] for r in got] == ["NULL-UPD"]


def test_bloom_type_mismatch_is_conservative(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(
        spark,
        t,
        spark.range(0, 50).selectExpr("cast(id as int) as id", "'a' as val"),
        bloom_cols=["id"],
    )
    entries = _live_entries(spark, t, 0)
    # probe with a LONG column: xxhash64 bytes differ from the int build
    # side, so the bloom must be unusable and the dir kept, not wrongly
    # pruned by a hash mismatch
    upd = spark.range(7, 8).selectExpr("id", "'B' as val")
    assert upd.schema["id"].dataType.simpleString() == "bigint"
    dirs = _bloom_prune_dirs(upd, ["id"], entries)
    assert len(dirs) == 1


def test_bloom_saturation_prunes_nothing(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(
        spark, t, _keys_df(spark, "a"), bloom_cols=["id"], bloom_bits=8,
        bloom_hashes=2,
    )
    commit_snapshot(spark, t, _keys_df(spark, "b"))
    entries = _live_entries(spark, t, _list_versions(spark, t)[-1])
    upd = spark.createDataFrame([("k0001b", "B")], "id string, val string")
    # 60 keys into 8 bits: saturated, everything survives — superset,
    # never a wrong skip; the merge still resolves via the scan
    assert len(_bloom_prune_dirs(upd, ["id"], entries)) == 2
    snapshot_merge(spark, t, upd, ["id"])
    got = read_snapshot(spark, t).where(F.col("id") == "k0001b").collect()
    assert [r["val"] for r in got] == ["B"]


def test_snapshot_lookup_reads_only_proven_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _keys_df(spark, "a"), bloom_cols=["id"])
    commit_snapshot(spark, t, _keys_df(spark, "b"))
    commit_snapshot(spark, t, _keys_df(spark, "c"))
    entries = _live_entries(spark, t, _list_versions(spark, t)[-1])
    by_tag = {}
    for path, _ in entries:
        tag = spark.read.parquet(path).select(F.substring("id", 6, 1)).first()[0]
        by_tag[tag] = path
    got = snapshot_lookup(spark, t, "id", ["k0007b", "k0041b"])
    rows = sorted(r["id"] for r in got.collect())
    assert rows == ["k0007b", "k0041b"]
    files = got.inputFiles()
    assert files and all(by_tag["b"] in f for f in files), files


def test_lookup_superset_exact_property(spark, tmp_path):
    """Property: for random typed key populations (ints and strings,
    with NULLs, split across dirs) and random probe sets, the
    bloom+stats-pruned lookup returns EXACTLY the full-scan filter —
    pruning may keep too much, never drop a matching row."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import itertools

    counter = itertools.count()

    @settings(max_examples=5, deadline=None)
    @given(
        data=st.lists(
            st.lists(
                st.one_of(
                    st.none(),
                    st.integers(min_value=-(2**31), max_value=2**31),
                ),
                min_size=1,
                max_size=8,
            ),
            min_size=1,
            max_size=3,
        ),
        probes=st.lists(
            st.integers(min_value=-(2**31), max_value=2**31),
            min_size=1,
            max_size=4,
        ),
        as_string=st.booleans(),
    )
    def check(data, probes, as_string):
        t = str(tmp_path / f"t{next(counter)}")
        typ = "string" if as_string else "long"
        conv = (lambda x: None if x is None else str(x)) if as_string else (
            lambda x: x
        )
        for i, chunk in enumerate(data):
            df = spark.createDataFrame(
                [(conv(x), i) for x in chunk], f"id {typ}, src int"
            )
            commit_snapshot(spark, t, df, bloom_cols=["id"], bloom_bits=256)
        vals = [conv(x) for x in probes]
        got = sorted(
            (r["id"], r["src"])
            for r in snapshot_lookup(spark, t, "id", vals).collect()
        )
        want = sorted(
            (r["id"], r["src"])
            for r in read_snapshot(spark, t)
            .where(F.col("id").isin([v for v in vals if v is not None]))
            .collect()
        )
        assert got == want, (vals, got, want)

    check()


def test_merge_and_compact_rewrites_carry_blooms(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _keys_df(spark, "a"), bloom_cols=["id"])
    commit_snapshot(spark, t, _keys_df(spark, "b"))
    upd = spark.createDataFrame([("k0002a", "U")], "id string, val string")
    snapshot_merge(spark, t, upd, ["id"])
    assert all(
        set(bl) == {"id"} for bl in _blooms_of(spark, t).values()
    ), "merge rewrite dropped the bloom"
    compact_snapshot(spark, t)
    blooms = _blooms_of(spark, t)
    assert len(blooms) == 1 and all(set(bl) == {"id"} for bl in blooms.values())
    # and the rebuilt bloom still serves lookups correctly
    got = snapshot_lookup(spark, t, "id", ["k0002a"]).collect()
    assert [r["val"] for r in got] == ["U"]
