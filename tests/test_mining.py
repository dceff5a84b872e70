"""Hard-negative mining: paraphrases land in positives (never negatives),
lexically-confusable-but-semantically-far docs become hard negatives,
unrelated docs appear nowhere, and unverifiable queries yield nothing."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from binance_data_pipeline_spark.operators.mining import mine_hard_negatives

DOCS = [
    ("q1", "the solar panel generates electricity from bright sunlight"),
    ("p1", "the solar panel turns bright sunlight into electricity"),
    ("h1", "the solar eclipse blocks bright sunlight from the panel of observers"),
    ("u1", "medieval castles were defended with boiling oil"),
    ("q2", "the eclipse observers waited"),  # no embedding row
]

EMB = [
    ("q1", [1.0, 0.0, 0.0, 0.0]),
    ("p1", [0.97, 0.24, 0.0, 0.0]),   # cosine ~0.97 with q1
    ("h1", [0.0, 1.0, 0.0, 0.0]),     # cosine 0 with q1
    ("u1", [0.0, 0.0, 1.0, 0.0]),
]


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    emb = spark.createDataFrame(EMB, "vec_id string, embedding array<double>")
    queries = docs.where("doc_id in ('q1', 'q2')").selectExpr(
        "doc_id as query_id", "text"
    )
    return docs, emb, queries


def test_mining_separates_positive_and_hard_negative(spark):
    docs, emb, queries = _frames(spark)
    rows = mine_hard_negatives(
        queries, docs, emb, k_pos=1, k_neg=3, k_lex=10, neg_max_sim=0.8
    ).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault((r["query_id"], r["kind"]), []).append(r)

    pos = by_kind.get(("q1", "positive"), [])
    assert [r["doc_id"] for r in pos] == ["p1"]
    assert pos[0]["sem_sim"] > 0.9 and pos[0]["lex_rank"] is None

    negs = by_kind.get(("q1", "hard_negative"), [])
    neg_ids = {r["doc_id"] for r in negs}
    assert "h1" in neg_ids            # lexically confusable, semantically far
    assert "p1" not in neg_ids        # paraphrase is a positive, not a negative
    assert "u1" not in neg_ids        # no lexical overlap -> never a candidate
    for r in negs:
        assert r["lex_rank"] is not None and r["sem_sim"] < 0.8

    # q2 has no embedding: no positives, and negatives are conservatively
    # dropped (an unverifiable candidate may be a paraphrase)
    assert not [k for k in by_kind if k[0] == "q2"]


def test_mining_ceiling_is_respected(spark):
    docs, emb, queries = _frames(spark)
    # ceiling of 1.01 admits even the paraphrase as a "negative"
    loose = mine_hard_negatives(
        queries.where("query_id = 'q1'"), docs, emb,
        k_pos=1, k_neg=5, k_lex=10, neg_max_sim=1.01,
    )
    ids = {r["doc_id"] for r in loose.where("kind = 'hard_negative'").collect()}
    assert "p1" in ids  # proves the exclusion in the strict test is the ceiling
