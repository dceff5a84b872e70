"""Retrieval capstone: one root directory holding everything a RAG /
search deployment serves from, plus the hybrid query that reads it.

    {root}/passages.parquet   the text units (docs, or chunk_documents
                              windows when chunk_tokens is set)
    {root}/bm25/              term-bucket-partitioned inverted index
    {root}/ann/               cell-partitioned IVF index over embeddings
                              (optional — only when embeddings given)
    {root}/manifest.parquet   what was built, written LAST (commit marker)

Build composes the engine's existing build-once pieces (bm25.build,
ivf.build — each keeps its own fingerprint); `hybrid_search` runs the
lexical and vector probes against the SAME root and fuses them with
reciprocal-rank fusion (score-scale-free, so no calibration between
BM25 scores and cosines). Embedding the query text is the caller's job
(the engine treats embeddings as data, not models — same stance as
operators/similarity.py); pass `query_embeddings=None` for pure lexical
search.

When chunking is on, embeddings must be keyed by PASSAGE id
(``doc_id << chunking >> {doc}#{idx}`` — the chunk_documents
convention); doc-level embeddings with chunked passages would fuse
ranks of different units and are rejected by id mismatch at build time
only in tests, not silently here — the manifest records which unit was
indexed so the reader can check.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .bm25 import bm25_query, bm25_topk, rrf_fuse
from .ivf import ivf_query, ivf_topk

__all__ = [
    "build_retrieval_index",
    "hybrid_search",
    "rerank",
    "overlap_scorer",
    "stub_scorer",
]


def build_retrieval_index(
    spark: SparkSession,
    docs: DataFrame,
    out_path: str,
    embeddings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_tokens: int | None = None,
    overlap_tokens: int = 32,
    n_term_buckets: int = 64,
    n_centroids: int = 16,
) -> dict[str, int]:
    """Build the serving root. Returns counts per artifact. Each
    sub-index rides its own build-once contract; the manifest is written
    last so a crashed build is detectable (no manifest = rebuild)."""
    out = out_path.rstrip("/")
    if chunk_tokens is not None:
        from .text import chunk_documents

        passages = chunk_documents(
            docs, id_col=id_col, text_col=text_col,
            chunk_tokens=chunk_tokens, overlap_tokens=overlap_tokens,
        ).select(
            F.concat_ws("#", F.col("id").cast("string"), F.col("chunk_idx")).alias(id_col),
            F.col("chunk_text").alias(text_col),
        )
        unit = "chunk"
    else:
        passages = docs.select(F.col(id_col), F.col(text_col))
        unit = "doc"
    passages.write.mode("overwrite").parquet(f"{out}/passages.parquet")
    passages = spark.read.parquet(f"{out}/passages.parquet")
    counts = {"passages": passages.count()}

    # the *_topk entry points own the fingerprint gating; running them
    # with a 1-row probe builds (or validates) the persisted index
    probe_q = passages.limit(1).selectExpr(f"{id_col} as query_id", f"{text_col} as text")
    bm25_topk(probe_q, passages, id_col=id_col, text_col=text_col,
              k=1, index_path=f"{out}/bm25", n_buckets=n_term_buckets).collect()
    counts["bm25_built"] = 1

    if embeddings is not None:
        probe_v = embeddings.limit(1)
        ivf_topk(probe_v, embeddings, id_col=emb_id_col, vec_col=vec_col,
                 k=1, n_centroids=n_centroids, index_path=f"{out}/ann").collect()
        counts["ann_vectors"] = embeddings.count()

    spark.createDataFrame(
        [(unit, counts["passages"], embeddings is not None)],
        "unit string, n_passages long, has_ann boolean",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/manifest.parquet")
    return counts


def hybrid_search(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    query_embeddings: DataFrame | None = None,
    k: int = 10,
    rrf_k: int = 60,
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Query the serving root: BM25 over the inverted index, optionally
    ANN over the vector index (``query_embeddings`` keyed like
    ``queries``' query_id), fused by RRF. Returns
    (query_id, doc_id, rrf_score, rk). Refuses a manifest-less root —
    a crashed build must not serve."""
    base = root.rstrip("/")
    try:
        manifest = spark.read.parquet(f"{base}/manifest.parquet").first()
    except Exception as e:  # AnalysisException: path missing
        raise ValueError(f"no manifest under {root} — incomplete build") from e
    lex = bm25_query(spark, f"{base}/bm25", queries, k=k)
    legs = [lex]
    if query_embeddings is not None:
        if not manifest["has_ann"]:
            raise ValueError(f"{root} was built without an ANN index")
        vec = ivf_query(
            spark, f"{base}/ann", query_embeddings,
            id_col=emb_id_col, vec_col=vec_col, k=k, nprobe=nprobe,
        ).select(
            F.col("query_id"), F.col("neighbor_id").alias("doc_id"), F.col("rk")
        )
        legs.append(vec)
    return rrf_fuse(legs, k=rrf_k, top_k=k)


# ---------------------------------------------------------------------------
# Rerank stage: injectable cross-encoder over the candidate set
# ---------------------------------------------------------------------------

#: Batch scorer contract: parallel lists of query/passage texts in,
#: one relevance score per pair out (higher = more relevant).
Scorer = Callable[[list[str], list[str]], "np.ndarray"]


def stub_scorer(q_texts: list[str], p_texts: list[str]) -> "np.ndarray":
    """Guard stub documenting the injection point for a real
    cross-encoder (e.g. a sentence-transformers CrossEncoder.predict —
    not installed in this container)."""
    raise NotImplementedError(
        "no cross-encoder injected — pass scorer=overlap_scorer for the "
        "dependency-free lexical scorer, or a CrossEncoder.predict-style callable"
    )


def overlap_scorer(q_texts: list[str], p_texts: list[str]) -> "np.ndarray":
    """Dependency-free default: token-set F1 between query and passage
    (the SQuAD-style overlap measure). A real, monotone relevance signal
    — an exact restatement of the query scores 1.0 — and deterministic,
    so rerank results are reproducible without any model."""
    out = np.zeros(len(q_texts), dtype=np.float64)
    for i, (q, p) in enumerate(zip(q_texts, p_texts)):
        qs, ps = set((q or "").lower().split()), set((p or "").lower().split())
        if not qs or not ps:
            continue
        inter = len(qs & ps)
        if inter == 0:
            continue
        prec, rec = inter / len(ps), inter / len(qs)
        out[i] = 2 * prec * rec / (prec + rec)
    return out


def rerank(
    spark: SparkSession,
    root: str,
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    scorer: Scorer | None = None,
) -> DataFrame:
    """Second-stage rerank of ``hybrid_search`` candidates: fetch each
    candidate's passage text from the serving root, score (query,
    passage) pairs with the injected cross-encoder, keep the top ``k``
    per query by the new score. Returns
    (query_id, doc_id, rerank_score, rk).

    Scale shape: ``candidates`` is |Q|·k rows — tiny next to the passage
    corpus — so it BROADCASTS into the passages scan (the corpus is
    never shuffled), the scorer sees only |Q|·k pairs in Arrow batches,
    and the final per-query top-k is a window over |Q|·k rows. A GPU
    cross-encoder drops in through the same batch contract as
    ``embedder.embed_texts``.
    """
    sc = scorer if scorer is not None else overlap_scorer
    base = root.rstrip("/")
    passages = spark.read.parquet(f"{base}/passages.parquet")
    id_col, text_col = passages.columns[0], passages.columns[1]
    # reserved aliases: the passage id column may itself be "doc_id"
    cand = candidates.select(
        F.col("query_id").alias("__c_qid"), F.col("doc_id").alias("__c_did")
    )
    pairs = (
        passages.join(
            F.broadcast(cand), on=F.col(id_col) == F.col("__c_did"), how="inner"
        )
        .select(
            F.col("__c_qid").alias("query_id"),
            F.col("__c_did").alias("doc_id"),
            F.col(text_col).alias("__p_text"),
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col("query_id"), F.col("text").alias("__q_text")
                )
            ),
            "query_id",
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            scores = np.asarray(
                sc(b["__q_text"].tolist(), b["__p_text"].tolist()), dtype=np.float64
            )
            if scores.shape != (len(b),):
                raise ValueError(
                    f"scorer returned shape {scores.shape}, expected ({len(b)},)"
                )
            out = b[["query_id", "doc_id"]].copy()
            out["rerank_score"] = scores
            yield out

    scored = pairs.mapInPandas(
        run, "query_id string, doc_id string, rerank_score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rerank_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )
