"""Trainable BPE: hand-computed merge sequence on the Sennrich-style
toy corpus, lossless word roundtrip, count monotonicity, determinism
under repartition, Arrow-only plan."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.bpe import (
    bpe_encode_word,
    bpe_token_count,
    bpe_tokenize,
    train_bpe,
)
from binance_data_pipeline_spark.plans.audit import audit_plan, plan_text


def _corpus(spark):
    # the classic BPE toy: "low" dominates, so l+o then lo+w merge first
    rows = [
        ("a", "low low low low low"),
        ("b", "lower lower newest newest"),
        ("c", "newest newest newest newest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_first_merges_follow_pair_frequencies(spark):
    merges = train_bpe(_corpus(spark), num_merges=10)
    # 'es' ties 'st'/'t</w>'/'we' at 8 and wins lexicographically; the
    # merged symbol then chains (es+t at 8, est+</w> at 8) before 'lo' (7)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert ("l", "o") in merges[:5]


def test_encode_word_roundtrip_and_greedy_rank(spark):
    merges = train_bpe(_corpus(spark), num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "lowest", "newest", "unseen", "xyzzy"]:
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks) == w + "</w>"


def test_tokenize_and_counts(spark):
    docs = _corpus(spark)
    merges = train_bpe(docs, num_merges=8)
    toks = {r["doc_id"]: r["tokens"] for r in bpe_tokenize(docs, merges).collect()}
    # detokenization: concatenating and splitting on </w> restores words
    for r in docs.collect():
        words = "".join(toks[r["doc_id"]]).split("</w>")
        assert [w for w in words if w] == r["text"].split()
    counts = {r["doc_id"]: r["n_tokens"] for r in bpe_token_count(docs, merges).collect()}
    for did, t in toks.items():
        assert counts[did] == len(t)
    # subword count is between word count and character count
    for r in docs.collect():
        n_words = len(r["text"].split())
        n_chars = len(r["text"].replace(" ", "")) + n_words  # + eow markers
        assert n_words <= counts[r["doc_id"]] <= n_chars


def test_training_deterministic_under_repartition(spark):
    docs = _corpus(spark)
    assert train_bpe(docs, num_merges=8) == train_bpe(docs.repartition(7), num_merges=8)


def test_merge_loop_stops_when_nothing_repeats(spark):
    d = spark.createDataFrame([("a", "ab cd ef")], "doc_id string, text string")
    merges = train_bpe(d, num_merges=50)
    assert len(merges) < 50  # singleton pairs are not merged


def test_apply_plan_is_arrow_only(spark):
    docs = _corpus(spark)
    merges = train_bpe(docs, num_merges=4)
    plan = bpe_token_count(docs, merges)
    findings = [f for f in audit_plan(plan) if f.code in ("PY_ROW_EVAL", "CARTESIAN")]
    assert findings == [], findings
    text = plan_text(plan)
    assert "ArrowEvalPython" in text and "BatchEvalPython" not in text
    assert "Exchange" not in text  # map-only application


def test_udf_closure_matches_module_encoder(spark):
    """The self-contained worker-side encoder must stay in lockstep with
    the public bpe_encode_word (the closure restates it so executors
    never import this package — drift here would be silent)."""
    docs = _corpus(spark)
    merges = train_bpe(docs, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = {r["doc_id"]: list(r["tokens"]) for r in bpe_tokenize(docs, merges).collect()}
    for r in docs.collect():
        expect = [t for w in r["text"].split() for t in bpe_encode_word(w, ranks)]
        assert toks[r["doc_id"]] == expect


def test_save_load_bpe_roundtrip(spark, tmp_path):
    from binance_data_pipeline_spark.operators.bpe import (
        bpe_tokenize,
        load_bpe,
        save_bpe,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "newer newest new")],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, num_merges=12)
    p = str(tmp_path / "bpe.parquet")
    save_bpe(spark, merges, p)
    loaded = load_bpe(spark, p)
    assert loaded == merges  # rank order restored exactly
    a = bpe_tokenize(docs, merges).orderBy("doc_id").collect()
    b = bpe_tokenize(docs, loaded).orderBy("doc_id").collect()
    assert [r["tokens"] for r in a] == [r["tokens"] for r in b]
