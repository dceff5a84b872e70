"""Retrieval evaluation: recall/precision@k, MRR and nDCG@k over a
ranked result set and a relevance-judgment table — the measurement leg
every retrieval deployment needs beside build (retrieval.py) and serve
(hybrid_search / rerank).

Inputs are plain DataFrames, so the same metrics run over BM25 output,
ANN output, fused or reranked output:

    results  (query_id, doc_id, rk)        rk = 1-based rank
    qrels    (query_id, doc_id[, rel])     rel int grade ≥ 1 (absent
                                           column → binary judgments)

Everything is hash aggregates + one broadcast-eligible join + one
window over qrels (judgment tables are small relative to corpora);
nothing driver-side. Formulas: standard TREC definitions —
DCG@k = Σ_hits (2^rel − 1)/log2(rk + 1), IDCG from the ideal ordering
of each query's judgments, MRR from the first relevant hit.

North-star extension; the reference has no retrieval surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["retrieval_metrics", "macro_metrics"]


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query metrics: (query_id, n_rel, hits, recall, precision,
    rr, ndcg) — all @k. Queries present in ``qrels`` but absent from
    ``results`` score zero (a system that returns nothing must not be
    graded only on what it returned)."""
    if "rel" in qrels.columns:
        judg = qrels.select("query_id", "doc_id", F.col("rel").cast("double"))
    else:
        judg = qrels.select("query_id", "doc_id", F.lit(1.0).alias("rel"))
    judg = judg.where(F.col("rel") > 0)

    topk = results.where(F.col("rk") <= k).select("query_id", "doc_id", "rk")
    hits = topk.join(judg, ["query_id", "doc_id"])

    per_q_hits = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits"),
        F.min("rk").alias("first_rel_rk"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rel")) - 1)
            / F.log2(F.col("rk") + F.lit(1.0))
        ).alias("dcg"),
    )

    # ideal DCG: each query's judgments in descending grade order
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        judg.withColumn("irk", F.row_number().over(w))
        .where(F.col("irk") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1)
                / F.log2(F.col("irk") + F.lit(1.0))
            ).alias("idcg"),
        )
    )
    n_rel = judg.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))

    return (
        n_rel.join(ideal, "query_id")
        .join(per_q_hits, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_rel")).alias("recall"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(k))).alias("precision"),
            F.coalesce(1.0 / F.col("first_rel_rk"), F.lit(0.0)).alias("rr"),
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg"),
        )
    )


def macro_metrics(per_query: DataFrame) -> DataFrame:
    """One row: arithmetic means over queries (macro-averaged recall@k,
    precision@k, MRR, nDCG@k) plus the query count."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("recall").alias("recall"),
        F.avg("precision").alias("precision"),
        F.avg("rr").alias("mrr"),
        F.avg("ndcg").alias("ndcg"),
    )
