"""Hard-negative mining — contrastive training pairs for retriever /
embedding training (the DPR recipe, Karpukhin et al. EMNLP 2020: "BM25
negatives are the hard ones"). Composes this engine's lexical and vector
families:

- **positives**: the semantically nearest docs per query (brute cosine
  top-k over the embedding join — swap in ivf/pq for corpus-scale runs);
- **hard negatives**: docs that score HIGH on BM25 (lexically look like
  answers) but sit BELOW a cosine ceiling (aren't actually semantically
  close) — exactly the confusable examples a contrastive loss needs;
  lexical-and-semantic hits are positives, not negatives, and are
  excluded by the ceiling.

One BM25 pass (partition-pruned when indexed), one embedding join over
the BM25 candidate set only (never all-pairs), per-query ranks. Output:
(query_id, doc_id, kind ∈ {positive, hard_negative}, lex_rank, sem_sim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import bm25_topk
from .similarity import cosine_topk_brute, pair_cosine_udf

__all__ = ["mine_hard_negatives"]


def mine_hard_negatives(
    queries: DataFrame,
    docs: DataFrame,
    embeddings: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_pos: int = 2,
    k_neg: int = 4,
    k_lex: int = 20,
    neg_max_sim: float = 0.8,
    bm25_index_path: str | None = None,
) -> DataFrame:
    """Mine (query → positive/hard-negative) doc pairs.

    ``queries`` rows must exist in ``embeddings`` (joined on
    query_id = emb_id) — a query with no embedding yields no positives
    and its negatives skip the semantic ceiling check conservatively
    (dropped, not passed: an unverifiable negative may be a paraphrase).
    ``k_lex`` bounds the BM25 candidate pool the ceiling is applied to;
    ``neg_max_sim`` is the cosine ceiling separating "confusable" from
    "actually relevant"."""
    q_emb = embeddings.select(
        F.col(emb_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    d_emb = embeddings.select(
        F.col(emb_id_col).alias("doc_id"), F.col(vec_col).alias("dv")
    )

    # positives: semantic top-k among embedded docs (exclude self)
    pos = cosine_topk_brute(
        queries.select(F.col(query_id_col).alias(emb_id_col))
        .join(embeddings, emb_id_col)
        .select(emb_id_col, vec_col),
        embeddings,
        id_col=emb_id_col,
        vec_col=vec_col,
        k=k_pos,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.lit("positive").alias("kind"),
        F.lit(None).cast("long").alias("lex_rank"),
        F.col("sim").alias("sem_sim"),
    )

    # lexical candidates, then the semantic ceiling over candidates ONLY
    lex = bm25_topk(
        queries,
        docs,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        id_col=id_col,
        text_col=text_col,
        k=k_lex,
        index_path=bm25_index_path,
    ).where(F.col("query_id") != F.col("doc_id"))
    cand = (
        lex.join(F.broadcast(q_emb), "query_id")
        .join(d_emb, "doc_id")
        .withColumn("sem_sim", F.round(pair_cosine_udf()(F.col("qv"), F.col("dv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rk").asc(), F.col("doc_id"))
    neg = (
        cand.where(F.col("sem_sim") < F.lit(neg_max_sim))
        .withColumn("nrk", F.row_number().over(w))
        .where(F.col("nrk") <= k_neg)
        .select(
            "query_id",
            "doc_id",
            F.lit("hard_negative").alias("kind"),
            F.col("rk").alias("lex_rank"),
            "sem_sim",
        )
    )
    return pos.unionByName(neg)
