"""Incremental dedup: arriving batches dedupe against persisted state
without recomputing admitted docs' signatures; existing keepers are
sticky; the streaming wrapper appends corpus + audit mapping per batch."""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.incremental_dedup import (
    dedup_batch,
    streaming_dedup_corpus,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill and the birds sing in the garden outside the house"
)
NEAR = BASE.replace("garden", "meadow")          # one-token edit: near-dup
OTHER = (
    "completely unrelated text about distributed query engines shuffling "
    "partitioned columnar data across executor nodes with adaptive plans"
)
OTHER_NEAR = OTHER.replace("adaptive", "runtime")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_batch_incremental_semantics(spark, tmp_path):
    state = str(tmp_path / "state")

    # ---- batch 1: two distinct docs + an internal near-dup -----------
    b1 = _docs(spark, [(1, BASE), (2, OTHER), (3, NEAR)])
    kept1, map1 = dedup_batch(b1, state, threshold=0.5)
    m1 = {r["doc_id"]: (r["kept_doc_id"], r["reason"]) for r in map1.collect()}
    assert m1 == {1: (1, "kept"), 2: (2, "kept"), 3: (1, "near_dup")}
    assert {r["doc_id"] for r in kept1.collect()} == {1, 2}

    sig_files_after_b1 = sorted(glob.glob(f"{state}/shingles.parquet/part-*"))
    assert sig_files_after_b1  # state exists

    # ---- batch 2: exact dup of 1, near-dup of 1, near-dup of 2,
    #               fresh doc, and an exact dup of the DROPPED doc 3 ----
    b2 = _docs(
        spark,
        [
            (10, BASE),                       # exact dup of existing keeper 1
            (11, BASE.replace("birds", "bees")),  # near-dup of 1
            (12, OTHER_NEAR),                 # near-dup of 2
            (13, "some genuinely new content about parquet footer statistics "
                 "pruning row groups during selective scans of wide tables"),
            (14, NEAR),                       # exact text of dropped doc 3
        ],
    )
    kept2, map2 = dedup_batch(b2, state, threshold=0.5)
    m2 = {r["doc_id"]: (r["kept_doc_id"], r["reason"]) for r in map2.collect()}
    assert m2[10] == (1, "exact_dup")     # existing fingerprint is sticky
    assert m2[11] == (1, "near_dup")      # matches existing keeper 1
    assert m2[12] == (2, "near_dup")      # matches existing keeper 2
    assert m2[13] == (13, "kept")
    # doc 3 was dropped as a near-dup of 1; its fingerprint maps to 1,
    # so a later exact copy of it also resolves to keeper 1
    assert m2[14] == (1, "exact_dup")
    assert {r["doc_id"] for r in kept2.collect()} == {13}

    # ---- no-recompute guarantee: batch-1 state files untouched -------
    files_after_b2 = set(glob.glob(f"{state}/shingles.parquet/part-*"))
    assert set(sig_files_after_b1) <= files_after_b2  # append-only: originals intact
    stored_ids = {
        r["id"] for r in spark.read.parquet(f"{state}/shingles.parquet").collect()
    }
    assert stored_ids == {1, 2, 13}  # kept docs only, appended once each


def test_dedup_batch_within_batch_chain_absorbed_by_existing(spark, tmp_path):
    """A within-batch near-dup CLUSTER where one member also matches an
    existing keeper: the whole cluster maps to the existing keeper."""
    state = str(tmp_path / "state")
    kept1, map1 = dedup_batch(_docs(spark, [(5, BASE)]), state, threshold=0.5)
    assert {r["doc_id"] for r in kept1.collect()} == {5}

    b2 = _docs(spark, [(20, NEAR), (21, NEAR.replace("cat", "kitten"))])
    kept2, map2 = dedup_batch(b2, state, threshold=0.5)
    m2 = {r["doc_id"]: (r["kept_doc_id"], r["reason"]) for r in map2.collect()}
    assert m2 == {20: (5, "near_dup"), 21: (5, "near_dup")}
    assert kept2.count() == 0


def test_streaming_dedup_corpus_end_to_end(spark, tmp_path):
    """File-source stream → foreachBatch dedup: kept docs and the audit
    mapping accumulate under out_path; near-dups of docs admitted in an
    EARLIER micro-batch map to the earlier keeper."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # seed the state with batch 1 via the batch API (same state contract)
    dedup_batch(_docs(spark, [(1, BASE), (2, OTHER)]), state, threshold=0.5)

    _docs(spark, [(30, NEAR), (31, "fresh streaming doc about watermarking "
                                   "late events in session windows")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = streaming_dedup_corpus(
        stream, state, out, ckpt, threshold=0.5
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    mapping = spark.read.parquet(f"{out}/mapping.parquet")
    m = {r["doc_id"]: (r["kept_doc_id"], r["reason"]) for r in mapping.collect()}
    assert m[30] == (1, "near_dup")   # matched the batch-API-seeded keeper
    assert m[31] == (31, "kept")
    corpus = spark.read.parquet(f"{out}/corpus.parquet")
    assert {r["doc_id"] for r in corpus.collect()} == {31}
    assert "batch_id" in mapping.columns


def test_streaming_dedup_replay_skips_committed_batches(spark, tmp_path):
    """Exactly-once face of the commit markers: re-delivering the same
    micro-batch (fresh checkpoint, same source, same batch id) must not
    duplicate corpus rows, mapping rows, or state — the committed batch
    is skipped, like test_heavyhitters' merge-state replay."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _docs(spark, [(1, BASE), (2, OTHER)]).coalesce(1).write.mode("append").parquet(src)

    def run(ckpt):
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = streaming_dedup_corpus(
            stream, state, out, str(tmp_path / ckpt), threshold=0.5
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run("ckpt1")
    first = sorted(r["doc_id"] for r in spark.read.parquet(f"{out}/corpus.parquet").collect())
    n_map = spark.read.parquet(f"{out}/mapping.parquet").count()
    shingle_rows = spark.read.parquet(f"{state}/shingles.parquet").count()

    run("ckpt2")  # fresh checkpoint: batch 0 re-delivered → must skip
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/corpus.parquet").collect()
    ) == first == [1, 2]
    assert spark.read.parquet(f"{out}/mapping.parquet").count() == n_map
    assert spark.read.parquet(f"{state}/shingles.parquet").count() == shingle_rows


def test_dedup_batch_string_ids(spark, tmp_path):
    """State schemas follow the caller's id dtype — string doc ids must
    round-trip through fingerprints/buckets/shingles intact across
    batches (a hardcoded long schema would null them on read)."""
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame([("doc-a", BASE), ("doc-b", OTHER)], "doc_id string, text string")
    kept1, _ = dedup_batch(b1, state, threshold=0.5)
    assert {r["doc_id"] for r in kept1.collect()} == {"doc-a", "doc-b"}

    b2 = spark.createDataFrame(
        [("doc-c", NEAR), ("doc-d", BASE)], "doc_id string, text string"
    )
    _, map2 = dedup_batch(b2, state, threshold=0.5)
    m = {r["doc_id"]: (r["kept_doc_id"], r["reason"]) for r in map2.collect()}
    assert m["doc-c"] == ("doc-a", "near_dup")
    assert m["doc-d"] == ("doc-a", "exact_dup")


def test_partitioned_state_matches_flat(spark, tmp_path):
    """state_partitions=P must be a pure layout change: the two-batch
    scenario produces byte-identical mappings under flat and partitioned
    state, and the bucket table lands as bh_mod=... hive partitions."""
    flat, part = str(tmp_path / "flat"), str(tmp_path / "part")
    batches = [
        [(1, BASE), (2, OTHER), (3, NEAR)],
        [(10, BASE), (11, BASE.replace("birds", "bees")), (12, OTHER_NEAR),
         (13, "some genuinely new content about parquet footer statistics "
              "pruning row groups during selective scans of wide tables"),
         (14, NEAR)],
    ]
    results = {}
    for state, p in ((flat, None), (part, 4)):
        maps = []
        for rows in batches:
            _, m = dedup_batch(_docs(spark, rows), state, threshold=0.5,
                               state_partitions=p)
            maps.append(sorted(map(tuple, m.collect())))
        results[state] = maps
    assert results[flat] == results[part]

    mod_dirs = {os.path.basename(d)
                for d in glob.glob(f"{part}/buckets.parquet/bh_mod=*")}
    assert mod_dirs and all(d.startswith("bh_mod=") for d in mod_dirs)
    assert len(mod_dirs) <= 4

    # batch 3 inherits P from the layout marker (no param needed); a
    # FRESH near-variant (fingerprint not yet in state) must match via
    # the pruned partitioned bucket scan
    _, m3 = dedup_batch(
        _docs(spark, [(50, BASE.replace("windowsill", "doorstep"))]),
        part, threshold=0.5,
    )
    got = {r["doc_id"]: (r["kept_doc_id"], r["reason"]) for r in m3.collect()}
    assert got == {50: (1, "near_dup")}


def test_partitioned_state_prunes_files(spark, tmp_path):
    """The corpus bucket scan under a batch must list only the bh_mod
    partitions the batch's own band hashes touch — PartitionFilters at
    the file listing, not a post-scan row filter."""
    from pyspark.sql import functions as F

    state = str(tmp_path / "state")
    dedup_batch(_docs(spark, [(1, BASE), (2, OTHER)]), state, threshold=0.5,
                state_partitions=8)

    # mirror the operator's pruned read: partition filter on bh_mod
    df = spark.read.parquet(f"{state}/buckets.parquet").where(
        F.col("bh_mod").isin([0, 3])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bh_mod" in plan.split("PartitionFilters", 1)[1][:200]
    # and the state is genuinely spread over several partition dirs, so
    # the filter above has real files to skip
    all_mods = {os.path.basename(os.path.dirname(f))
                for f in spark.read.parquet(f"{state}/buckets.parquet").inputFiles()}
    assert len(all_mods) > 2


def test_partitioned_state_layout_guards(spark, tmp_path):
    """Layout is immutable per state dir: re-partitioning a flat state or
    changing P both raise instead of silently mispruning."""
    import pytest

    flat = str(tmp_path / "flat")
    dedup_batch(_docs(spark, [(1, BASE)]), flat, threshold=0.5)
    with pytest.raises(ValueError, match="flat bucket layout"):
        dedup_batch(_docs(spark, [(2, OTHER)]), flat, threshold=0.5,
                    state_partitions=4)

    part = str(tmp_path / "part")
    dedup_batch(_docs(spark, [(1, BASE)]), part, threshold=0.5,
                state_partitions=4)
    with pytest.raises(ValueError, match="immutable"):
        dedup_batch(_docs(spark, [(2, OTHER)]), part, threshold=0.5,
                    state_partitions=8)


def test_compact_state_partitioned_layout(spark, tmp_path):
    """Compaction preserves the bh_mod hive layout (files bounded PER
    partition) and the next batch still matches."""
    from binance_data_pipeline_spark.operators.incremental_dedup import compact_state

    state = str(tmp_path / "state")
    for i, rows in enumerate(([(1, BASE)], [(2, OTHER)])):
        dedup_batch(_docs(spark, rows), state, threshold=0.5,
                    state_partitions=4 if i == 0 else None)
    compact_state(spark, state, files_per_table=1)
    assert glob.glob(f"{state}/buckets.parquet/bh_mod=*")  # layout survives

    _, m = dedup_batch(_docs(spark, [(60, NEAR)]), state, threshold=0.5)
    got = {r["doc_id"]: (r["kept_doc_id"], r["reason"]) for r in m.collect()}
    assert got == {60: (1, "near_dup")}


def test_compact_state_preserves_semantics(spark, tmp_path):
    """State compaction rewrites the append-only tables into few files;
    the next batch must behave exactly as before compaction."""
    from binance_data_pipeline_spark.operators.incremental_dedup import compact_state

    state = str(tmp_path / "state")
    for i in range(4):  # several appends → several part files per table
        dedup_batch(
            _docs(spark, [(100 + i, f"unique batch {i} content padded with "
                                    f"enough distinct words {i} to shingle")]),
            state, threshold=0.5,
        )
    dedup_batch(_docs(spark, [(1, BASE)]), state, threshold=0.5)
    before = len(glob.glob(f"{state}/shingles.parquet/part-*"))
    assert before >= 5

    counts = compact_state(spark, state, files_per_table=1)
    assert set(counts) == {"fingerprints.parquet", "buckets.parquet", "shingles.parquet"}
    assert all(v <= 1 for v in counts.values())

    # post-compaction: matching still works against the rewritten state
    _, m = dedup_batch(_docs(spark, [(50, NEAR)]), state, threshold=0.5)
    got = {r["doc_id"]: (r["kept_doc_id"], r["reason"]) for r in m.collect()}
    assert got == {50: (1, "near_dup")}
