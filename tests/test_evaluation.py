"""Retrieval metrics vs hand-computed TREC values, graded and binary
judgments, zero-return queries, and composition with hybrid_search."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import pytest

from binance_data_pipeline_spark.operators.evaluation import (
    macro_metrics,
    retrieval_metrics,
)


def test_hand_computed_binary_metrics(spark):
    # q1: rel docs {a, b, c}; system ranks a@1, x@2, b@3 → @3:
    #   hits=2, recall=2/3, precision=2/3, rr=1, and with binary grades
    #   dcg = 1/log2(2) + 1/log2(4) = 1.5, idcg = 1/log2(2)+1/log2(3)+1/log2(4)
    results = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3)],
        "query_id string, doc_id string, rk long",
    )
    qrels = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c")], "query_id string, doc_id string"
    )
    m = retrieval_metrics(results, qrels, k=3).first()
    assert m["n_rel"] == 3 and m["hits"] == 2
    assert abs(m["recall"] - 2 / 3) < 1e-12
    assert abs(m["precision"] - 2 / 3) < 1e-12
    assert abs(m["rr"] - 1.0) < 1e-12
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(m["ndcg"] - dcg / idcg) < 1e-12


def test_graded_ndcg_and_first_rel_rank(spark):
    # graded: rel(a)=3, rel(b)=1; ranked b@1, a@2 → ideal is a then b
    results = spark.createDataFrame(
        [("q", "b", 1), ("q", "a", 2)], "query_id string, doc_id string, rk long"
    )
    qrels = spark.createDataFrame(
        [("q", "a", 3), ("q", "b", 1)], "query_id string, doc_id string, rel int"
    )
    m = retrieval_metrics(results, qrels, k=10).first()
    dcg = (2**1 - 1) / math.log2(2) + (2**3 - 1) / math.log2(3)
    idcg = (2**3 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3)
    assert abs(m["ndcg"] - dcg / idcg) < 1e-12
    assert abs(m["rr"] - 1.0) < 1e-12  # b IS relevant at rank 1


def test_zero_return_query_scores_zero_and_macro(spark):
    results = spark.createDataFrame(
        [("q1", "a", 1)], "query_id string, doc_id string, rk long"
    )
    qrels = spark.createDataFrame(
        [("q1", "a"), ("q2", "z")], "query_id string, doc_id string"
    )
    per_q = retrieval_metrics(results, qrels, k=5)
    rows = {r["query_id"]: r for r in per_q.collect()}
    assert rows["q2"]["hits"] == 0 and rows["q2"]["ndcg"] == 0.0
    assert rows["q2"]["rr"] == 0.0 and rows["q2"]["recall"] == 0.0
    mac = macro_metrics(per_q).first()
    assert mac["n_queries"] == 2
    assert abs(mac["mrr"] - 0.5) < 1e-12  # (1.0 + 0.0) / 2


def test_metrics_over_hybrid_search(spark, tmp_path):
    """The metrics frame composes directly with hybrid_search output:
    self-retrieval (each doc queried by its own text) scores a perfect
    MRR/recall@1 on a self-contained root."""
    from binance_data_pipeline_spark.operators.retrieval import (
        build_retrieval_index,
        hybrid_search,
    )

    docs = spark.createDataFrame(
        [("d1", "solar panels convert sunlight into electricity"),
         ("d2", "medieval castles defended towns with stone walls"),
         ("d3", "rivers carve canyons through layered sedimentary rock")],
        "doc_id string, text string",
    )
    root = str(tmp_path / "evalroot")
    build_retrieval_index(spark, docs, root, embed_dim=64,
                          n_term_buckets=4, n_centroids=2)
    # query ids live in their own namespace (colliding with a doc id
    # would trigger the ANN leg's self-match exclusion)
    queries = docs.selectExpr("concat('q_', doc_id) as query_id", "text")
    res = hybrid_search(spark, root, queries, k=1)
    qrels = docs.selectExpr("concat('q_', doc_id) as query_id", "doc_id")
    mac = macro_metrics(retrieval_metrics(res, qrels, k=1)).first()
    assert mac["n_queries"] == 3
    assert abs(mac["mrr"] - 1.0) < 1e-12 and abs(mac["recall"] - 1.0) < 1e-12


def test_cli_eval(spark, tmp_path, capsys):
    from binance_data_pipeline_spark.__main__ import main

    docs = spark.createDataFrame(
        [("d1", "solar panels convert sunlight into electricity"),
         ("d2", "medieval castles defended towns with stone walls")],
        "doc_id string, text string",
    )
    src = str(tmp_path / "docs.parquet"); docs.write.parquet(src)
    root = str(tmp_path / "root")
    assert main(["index", "--docs", src, "--out", root,
                 "--embed-dim", "32", "--term-buckets", "4",
                 "--centroids", "2"]) == 0
    spark.createDataFrame(
        [("q1", "solar sunlight electricity")], "query_id string, text string"
    ).write.parquet(str(tmp_path / "queries.parquet"))
    spark.createDataFrame(
        [("q1", "d1")], "query_id string, doc_id string"
    ).write.parquet(str(tmp_path / "qrels.parquet"))
    capsys.readouterr()
    assert main(["eval", "--root", root,
                 "--queries", str(tmp_path / "queries.parquet"),
                 "--qrels", str(tmp_path / "qrels.parquet"), "--k", "1"]) == 0
    out = capsys.readouterr().out
    assert "n_queries=1" in out and "mrr=1.0000" in out and "recall@1=1.0000" in out
