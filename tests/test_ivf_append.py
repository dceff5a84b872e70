"""Incremental IVF maintenance: appended vectors become queryable
without a rebuild, fingerprint hand-off keeps the build gate closed,
and batch-id replays append nothing."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.ivf import (
    append_to_ivf_index,
    corpus_fingerprint,
    ivf_query,
    ivf_topk,
)


def _vecs(spark, ids, shift=0.0):
    rows = [
        (i, [1.0 + 0.01 * i + shift, float((i * 7) % 5), 1.0, 0.5]) for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_append_then_query_without_rebuild(spark, tmp_path):
    base = str(tmp_path / "emb.parquet")
    _vecs(spark, range(30)).write.parquet(base)
    corpus = spark.read.parquet(base)
    idx = str(tmp_path / "ivf_index")
    queries = corpus.where(F.col("vec_id") < 3)
    ivf_topk(queries, corpus, k=3, n_centroids=4, nprobe=4, index_path=idx).collect()
    cent_mtime = os.path.getmtime(os.path.join(idx, "centroids.parquet"))

    # grow the corpus on disk, append the batch into the index
    _vecs(spark, range(1000, 1010)).write.mode("append").parquet(base)
    grown = spark.read.parquet(base)
    batch = grown.where(F.col("vec_id") >= 1000)
    params = "k16|it2|s4096|vec_id|embedding"  # must match ivf_topk defaults
    n = append_to_ivf_index(
        spark, idx, batch, fingerprint=corpus_fingerprint(grown, params)
    )
    assert n == 10

    # appended neighbors are findable straight from the index
    got = {
        r["neighbor_id"]
        for r in ivf_query(
            spark, idx, batch.where(F.col("vec_id") == 1000), k=3, nprobe=4
        ).collect()
    }
    assert got & set(range(1001, 1010)), got

    # the fingerprint hand-off keeps the gate closed: serving the grown
    # corpus neither rebuilds nor retrains (centroids untouched)
    ivf_topk(queries, grown, k=3, nprobe=4, index_path=idx).collect()
    assert os.path.getmtime(os.path.join(idx, "centroids.parquet")) == cent_mtime


def test_append_replay_is_skipped(spark, tmp_path):
    corpus = _vecs(spark, range(20))
    idx = str(tmp_path / "ivf_index")
    queries = corpus.where(F.col("vec_id") < 2)
    ivf_topk(queries, corpus, k=2, n_centroids=4, nprobe=4, index_path=idx).collect()

    batch = _vecs(spark, range(500, 505))
    assert append_to_ivf_index(spark, idx, batch, batch_id=7) == 5
    # replay of the same batch id: nothing appended, no duplicates
    assert append_to_ivf_index(spark, idx, batch, batch_id=7) == 0
    cells = spark.read.parquet(os.path.join(idx, "cells.parquet"))
    assert cells.where(F.col("neighbor_id") >= 500).count() == 5


def test_append_without_fingerprint_triggers_rebuild_later(spark, tmp_path):
    """Not passing the new fingerprint is safe: the next gated call sees
    a stale index and rebuilds (wasted work, never wrong answers)."""
    base = str(tmp_path / "emb.parquet")
    _vecs(spark, range(20)).write.parquet(base)
    corpus = spark.read.parquet(base)
    idx = str(tmp_path / "ivf_index")
    queries = corpus.where(F.col("vec_id") < 2)
    ivf_topk(queries, corpus, k=2, n_centroids=4, nprobe=4, index_path=idx).collect()

    _vecs(spark, range(600, 605)).write.mode("append").parquet(base)
    grown = spark.read.parquet(base)
    append_to_ivf_index(spark, idx, grown.where(F.col("vec_id") >= 600))
    meta_before = os.path.getmtime(os.path.join(idx, "meta.parquet"))
    ivf_topk(queries, grown, k=2, n_centroids=4, nprobe=4, index_path=idx).collect()
    assert os.path.getmtime(os.path.join(idx, "meta.parquet")) != meta_before


def test_pq_append_then_query_and_replay_skip(spark, tmp_path):
    from binance_data_pipeline_spark.operators.pq import (
        append_to_ivfpq_index,
        ivfpq_query,
        ivfpq_topk,
    )

    def vecs(ids, bump=0.0):
        rows = [
            (i, [0.1 * ((i * 3) % 7) + bump, 1.0, 0.2 * (i % 5), 0.5]) for i in ids
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    corpus = vecs(range(40))
    idx = str(tmp_path / "ivfpq_index")
    queries = corpus.where(F.col("vec_id") < 2)
    ivfpq_topk(
        queries, corpus, k=2, n_centroids=4, m=2, ksub=8, nprobe=4, index_path=idx
    ).collect()

    # the batch is its own tight cluster, far from every original
    # direction, so its members are each other's true nearest neighbors
    batch = spark.createDataFrame(
        [(900 + j, [9.0, -5.0, 0.01 * j, -3.0]) for j in range(5)],
        "vec_id long, embedding array<double>",
    )
    n = append_to_ivfpq_index(spark, idx, batch, batch_id=1)
    assert n == 5
    assert append_to_ivfpq_index(spark, idx, batch, batch_id=1) == 0  # replay

    cells = spark.read.parquet(os.path.join(idx, "cells.parquet"))
    appended = cells.where(F.col("neighbor_id") >= 900)
    assert appended.count() == 5
    assert len(appended.first()["code"]) == 2  # coded, not raw vectors

    # appended ids are findable from the index. The batch is deliberately
    # OUT of the training distribution, so its codes reconstruct poorly
    # (the documented drift caveat) — the refine path is what makes an
    # appended index dependable: exact re-rank over a generous shortlist
    # puts the true (appended) neighbors on top.
    probe = spark.createDataFrame(
        [(901, [9.0, -5.0, 0.011, -3.0])], "vec_id long, embedding array<double>"
    )
    got = {
        r["neighbor_id"]
        for r in ivfpq_query(
            spark, idx, probe, k=3, nprobe=4, refine_factor=16,
            refine_source=corpus.unionByName(batch),
        ).collect()
    }
    assert got == {900, 902, 903}, got  # the rest of the appended cluster


def test_streaming_ivf_append_exactly_once_across_checkpoint_loss(spark, tmp_path):
    from binance_data_pipeline_spark.operators.ivf import streaming_ivf_append

    corpus = _vecs(spark, range(25))
    idx = str(tmp_path / "ivf_index")
    ivf_topk(
        corpus.where(F.col("vec_id") < 2), corpus, k=2, n_centroids=4,
        nprobe=4, index_path=idx,
    ).collect()

    src = str(tmp_path / "arrivals")
    _vecs(spark, range(100, 110)).write.parquet(src)
    stream = spark.readStream.schema("vec_id long, embedding array<double>").parquet(src)
    q = streaming_ivf_append(stream, idx, str(tmp_path / "ckpt1"), available_now=True)
    q.awaitTermination(120)

    cells = spark.read.parquet(os.path.join(idx, "cells.parquet"))
    assert cells.where(F.col("neighbor_id") >= 100).count() == 10

    # checkpoint LOSS: a fresh checkpoint re-delivers batch 0 — the
    # commit marker under {idx}/appends/ skips it, no duplicate rows
    stream2 = spark.readStream.schema("vec_id long, embedding array<double>").parquet(src)
    q2 = streaming_ivf_append(stream2, idx, str(tmp_path / "ckpt2"), available_now=True)
    q2.awaitTermination(120)
    cells = spark.read.parquet(os.path.join(idx, "cells.parquet"))
    assert cells.where(F.col("neighbor_id") >= 100).count() == 10
