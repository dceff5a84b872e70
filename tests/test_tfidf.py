"""TF-IDF featurization: weights match the hand-computed smooth-idf
convention, vectors are L2-normalized CSR rows, out-of-vocab tokens
drop, the hashing trick is deterministic, and the whole pass plans
map-only (zero exchanges)."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import pytest

from binance_data_pipeline_spark.operators.tfidf import hashing_tf, tfidf_vectors
from binance_data_pipeline_spark.operators.vocab import build_vocab, idf_table


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "a mat and a cat"),
        ],
        "doc_id long, text string",
    )


def _vocab_with_idf(spark, docs):
    v = build_vocab(docs, vocab_size=100, tokenizer="whitespace", min_count=1)
    return v.drop("doc_count").join(
        idf_table(docs).select("token", "idf"), "token"
    )


def test_tfidf_matches_hand_computation(spark):
    docs = _docs(spark)
    vocab = _vocab_with_idf(spark, docs)
    out = {r["id"]: r for r in tfidf_vectors(docs, vocab, l2_normalize=False).collect()}
    tok_id = {r["token"]: r["token_id"] for r in vocab.collect()}
    idf = {r["token"]: r["idf"] for r in vocab.collect()}

    row = out[2]  # "the dog sat" — tf 1 each
    got = dict(zip(row["indices"], row["values"]))
    for t in ("the", "dog", "sat"):
        assert got[tok_id[t]] == pytest.approx(idf[t], abs=1e-5)
    assert list(row["indices"]) == sorted(row["indices"])

    row1 = out[1]  # "the" twice → weight 2 × idf(the)
    got1 = dict(zip(row1["indices"], row1["values"]))
    assert got1[tok_id["the"]] == pytest.approx(2 * idf["the"], abs=1e-5)


def test_tfidf_l2_normalized_and_oov_dropped(spark):
    docs = _docs(spark)
    vocab = _vocab_with_idf(spark, docs).where("token <> 'dog'")
    out = {r["id"]: r for r in tfidf_vectors(docs, vocab).collect()}
    tok_id = {r["token"]: r["token_id"] for r in vocab.collect()}
    assert tok_id and "dog" not in tok_id
    row = out[2]
    assert len(row["indices"]) == 2  # dog dropped as OOV
    assert math.fsum(v * v for v in row["values"]) == pytest.approx(1.0, abs=1e-4)


def test_hashing_tf_deterministic_and_bounded(spark):
    docs = _docs(spark)
    a = {r["id"]: (list(r["indices"]), list(r["values"]))
         for r in hashing_tf(docs, dim=64).collect()}
    b = {r["id"]: (list(r["indices"]), list(r["values"]))
         for r in hashing_tf(docs, dim=64).collect()}
    assert a == b
    assert all(0 <= i < 64 for idx, _ in a.values() for i in idx)
    # "the cat sat on the mat": 6 tokens, "the" repeats → ≤5 buckets
    assert 1 <= len(a[1][0]) <= 5


def test_tfidf_is_map_only(spark):
    """Featurization must plan zero exchanges — TF is row-local and the
    vocab rides a broadcast variable, so any shuffle here is waste."""
    docs = _docs(spark)
    vocab = _vocab_with_idf(spark, docs)
    for out in (tfidf_vectors(docs, vocab), hashing_tf(docs, dim=32)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_tfidf_id_dtype_follows_caller(spark):
    docs = spark.createDataFrame(
        [("d-1", "the cat sat")], "doc_id string, text string"
    )
    vocab = _vocab_with_idf(spark, _docs(spark))
    out = tfidf_vectors(docs, vocab)
    assert dict(out.dtypes)["id"] == "string"
    assert out.first()["id"] == "d-1"


def test_tfidf_validates_vocab_columns(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="token_id"):
        tfidf_vectors(docs, docs.selectExpr("text as token"))
