"""Persisted LSH index: build/serve parity with ann_lsh_topk, serve-path
vs distributed-fallback equality, bucket partition pruning, staleness +
meta-last crash contract, exclude_self semantics."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.catalog import load_table
from binance_data_pipeline_spark.operators import similarity as S
from binance_data_pipeline_spark.operators.lsh_index import (
    build_lsh_index,
    lsh_query,
    lsh_topk,
)

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_lsh_index_matches_in_memory_ann(spark, tmp_path):
    e = load_table(spark, SF, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    idx = str(tmp_path / "lsh")
    got = lsh_topk(q, e, k=3, index_path=idx)
    ref = S.ann_lsh_topk(q, e, k=3, queries_within_corpus=True)
    # same hyperplanes → same candidate buckets → same re-ranked ids
    assert _pairs(got) == _pairs(ref)
    # ranks are 1..k per query and sims are within rounding of reference
    by_pair = {
        (r["query_id"], r["neighbor_id"]): (r["sim"], r["rk"]) for r in got.collect()
    }
    for r in ref.collect():
        sim, _ = by_pair[(r["query_id"], r["neighbor_id"])]
        assert abs(sim - r["sim"]) <= 1e-3


def test_serve_kernel_equals_distributed_fallback(spark, tmp_path):
    e = load_table(spark, SF, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    idx = str(tmp_path / "lsh")
    build_lsh_index(e, idx)
    kernel = lsh_query(spark, idx, q, k=3)
    joined = lsh_query(spark, idx, q, k=3, max_local_queries=0)
    assert _pairs(kernel) == _pairs(joined)
    ker = {(r["query_id"], r["neighbor_id"]): r["rk"] for r in kernel.collect()}
    jnd = {(r["query_id"], r["neighbor_id"]): r["rk"] for r in joined.collect()}
    assert ker == jnd


def test_serve_path_reads_only_probed_buckets(spark, tmp_path):
    e = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "lsh")
    build_lsh_index(e, idx)
    q = e.where(F.col("vec_id") < 3)
    # reconstruct the serve-path scan filter: 3 queries × 12 tables probe
    # at most 36 buckets; the partition-pruned scan must list fewer files
    # than the full index
    full = spark.read.parquet(os.path.join(idx, "buckets.parquet"))
    total_files = full.select(F.input_file_name()).distinct().count()
    import numpy as np

    from binance_data_pipeline_spark.operators.similarity import _hyperplanes

    rows = q.select("vec_id", "embedding").collect()
    Q = np.asarray([[float(x) for x in r[1]] for r in rows])
    planes = np.asarray(_hyperplanes(4 * 12, 64))
    bits = (Q @ planes.T) > 0
    sigs = (bits.reshape(len(rows), 12, 4) * (1 << np.arange(4))).sum(axis=2)
    pred = None
    for i in range(len(rows)):
        for t in range(12):
            term = (F.col("tbl") == t) & (F.col("sig") == int(sigs[i, t]))
            pred = term if pred is None else pred | term
    pruned = full.where(pred)
    # partition pruning is visible two ways: the physical plan carries the
    # tbl/sig PartitionFilters, and the files actually scanned are at most
    # the probed buckets (input_file_name reflects post-pruning reads)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "tbl" in plan
    pruned_files = pruned.select(F.input_file_name()).distinct().count()
    assert pruned_files < total_files
    assert pruned_files <= 36


def test_staleness_rebuild_and_meta_last_contract(spark, tmp_path):
    import shutil

    from binance_data_pipeline_spark.operators.ivf import _read_index_fingerprint

    src = str(tmp_path / "corpus.parquet")
    load_table(spark, SF, "embeddings").limit(50).write.parquet(src)
    e = spark.read.parquet(src)
    q = e.limit(3)
    idx = str(tmp_path / "lsh")
    lsh_topk(q, e, k=2, index_path=idx).collect()
    fp1 = _read_index_fingerprint(spark, idx)
    assert fp1 is not None
    # unchanged corpus: no rebuild (fingerprint stable)
    lsh_topk(q, e, k=2, index_path=idx).collect()
    assert _read_index_fingerprint(spark, idx) == fp1
    # corpus regenerated in place: fingerprint moves, index rebuilds
    shutil.rmtree(src)
    load_table(spark, SF, "embeddings").limit(80).write.parquet(src)
    e2 = spark.read.parquet(src)
    lsh_topk(e2.limit(3), e2, k=2, index_path=idx).collect()
    fp2 = _read_index_fingerprint(spark, idx)
    assert fp2 is not None and fp2 != fp1
    # meta written LAST: an index without meta reads as absent
    shutil.rmtree(os.path.join(idx, "meta.parquet"))
    assert _read_index_fingerprint(spark, idx) is None


def test_exclude_self_off_keeps_identity_hit(spark, tmp_path):
    e = load_table(spark, SF, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    idx = str(tmp_path / "lsh")
    build_lsh_index(e, idx)
    kept = lsh_query(spark, idx, q, k=3, exclude_self=False)
    rows = {r["query_id"]: r for r in kept.where("rk = 1").collect()}
    # a vector's nearest neighbor including itself IS itself, sim 1.0
    for qid, r in rows.items():
        assert r["neighbor_id"] == qid and r["sim"] == pytest.approx(1.0, abs=1e-4)
    dropped = lsh_query(spark, idx, q, k=3, exclude_self=True)
    assert all(r["query_id"] != r["neighbor_id"] for r in dropped.collect())


def test_empty_query_batch_returns_typed_empty(spark, tmp_path):
    e = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "lsh")
    build_lsh_index(e, idx)
    out = lsh_query(spark, idx, e.where(F.col("vec_id") < 0), k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "sim", "rk"]


def test_append_grows_index_without_rebuild_and_replay_skips(spark, tmp_path):
    from binance_data_pipeline_spark.operators.ivf import (
        _read_index_fingerprint,
        corpus_fingerprint,
    )
    from binance_data_pipeline_spark.operators.lsh_index import append_to_lsh_index

    src = str(tmp_path / "corpus.parquet")
    load_table(spark, SF, "embeddings").where(F.col("vec_id") < 150).write.parquet(src)
    e = spark.read.parquet(src)
    idx = str(tmp_path / "lsh")
    q0 = e.where(F.col("vec_id") < 3)
    lsh_topk(q0, e, k=2, index_path=idx).collect()

    # grow the corpus: append a clone of vector 1 under a new id; pass the
    # grown corpus's fingerprint so the serve gate stays closed
    clone = e.where(F.col("vec_id") == 1).withColumn("vec_id", F.lit(999_999).cast("long"))
    clone.write.mode("append").parquet(src)
    grown = spark.read.parquet(src)
    fp = corpus_fingerprint(grown, "p4|t12|d64|vec_id|embedding")
    n = append_to_lsh_index(spark, idx, clone, fingerprint=fp, batch_id=7)
    assert n == 1

    # sentinel: a rebuild atomically replaces the index dir, deleting this
    open(os.path.join(idx, "__sentinel"), "w").close()
    got = lsh_topk(grown.where(F.col("vec_id") == 1), grown, k=2, index_path=idx)
    top = got.where("rk = 1").first()
    # the appended clone is vector 1's exact duplicate: top hit, sim 1.0
    assert top["neighbor_id"] == 999_999 and top["sim"] == pytest.approx(1.0, abs=1e-4)
    assert os.path.exists(os.path.join(idx, "__sentinel")), "index was rebuilt"
    assert _read_index_fingerprint(spark, idx) == fp

    # replay of the same batch id appends nothing and changes no rows
    before = spark.read.parquet(os.path.join(idx, "buckets.parquet")).count()
    assert append_to_lsh_index(spark, idx, clone, fingerprint=fp, batch_id=7) == 0
    after = spark.read.parquet(os.path.join(idx, "buckets.parquet")).count()
    assert before == after


def test_append_new_buckets_become_probeable_same_process(spark, tmp_path):
    """An appended vector can open a (tbl, sig) bucket dir that did not
    exist at build time; the meta rewrite must re-key the memoized
    existence set so the SAME process probes it."""
    from binance_data_pipeline_spark.operators.lsh_index import append_to_lsh_index

    base = spark.createDataFrame(
        [(int(i), [1.0] * 64) for i in range(5)], "vec_id long, embedding array<double>"
    )
    idx = str(tmp_path / "lsh")
    build_lsh_index(base, idx)
    # an orthogonal-ish vector lands in different buckets than the all-ones
    newv = spark.createDataFrame(
        [(100, [1.0] + [-1.0] * 63)], "vec_id long, embedding array<double>"
    )
    # prime the memo with the PRE-append listing, then append
    lsh_query(spark, idx, newv, k=1).collect()
    append_to_lsh_index(spark, idx, newv)
    got = lsh_query(spark, idx, newv, k=1, exclude_self=False)
    top = got.first()
    assert top is not None and top["neighbor_id"] == 100 and top["sim"] == pytest.approx(1.0, abs=1e-4)
