"""Unigram-LM tokenizer: EM training semantics on a toy corpus,
lossless Viterbi roundtrips, char fallback, repartition invariance, and
the Arrow-only application plan."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import math

import pytest

from binance_data_pipeline_spark.operators.unigram import (
    train_unigram,
    unigram_encode_word,
    unigram_token_count,
    unigram_tokenize,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def toy_model(spark):
    # 'low' and 'er'/'est' dominate — the classic subword toy corpus
    texts = ["low low low low low", "lower lower", "lowest lowest lowest",
             "newer newer newer newer", "newest newest"] * 3
    return train_unigram(_docs(spark, texts), vocab_size=24, max_piece_len=6)


def test_model_is_a_normalized_log_distribution(toy_model):
    total = sum(math.exp(lp) for lp in toy_model.values())
    assert abs(total - 1.0) < 1e-9
    assert all(lp < 0 for lp in toy_model.values())


def test_frequent_morphemes_survive_pruning(toy_model):
    assert "low" in toy_model, sorted(toy_model)
    # every observed character survives (totality floor)
    for ch in "lowernst":
        assert ch in toy_model


def test_viterbi_roundtrip_is_lossless(toy_model):
    for w in ["low", "lower", "lowest", "newer", "newest", "news", "zebra!"]:
        pieces = unigram_encode_word(w, toy_model)
        assert "".join(pieces) == w, (w, pieces)


def test_frequent_word_stays_whole_rare_word_splits(toy_model):
    assert unigram_encode_word("low", toy_model) == ["low"]
    rare = unigram_encode_word("lowestest", toy_model)
    assert len(rare) >= 2 and "".join(rare) == "lowestest"


def test_unknown_chars_fall_back_to_single_char_tokens(toy_model):
    pieces = unigram_encode_word("l0w#", toy_model)
    assert "".join(pieces) == "l0w#"
    assert "0" in pieces and "#" in pieces


def test_tokenize_and_count_agree(spark, toy_model):
    docs = _docs(spark, ["low lower lowest", "newer newest zebra"])
    toks = {r["doc_id"]: r["tokens"] for r in
            unigram_tokenize(docs, toy_model).collect()}
    counts = {r["doc_id"]: r["n_tokens"] for r in
              unigram_token_count(docs, toy_model).collect()}
    for d, t in toks.items():
        assert counts[d] == len(t)
        # word-level losslessness through the distributed path
    assert "".join(toks[0]) == "lowlowerlowest"


def test_training_is_repartition_invariant(spark):
    texts = ["the cat sat on the mat", "the bat and the cat", "mats and bats"] * 4
    a = train_unigram(_docs(spark, texts), vocab_size=30, max_piece_len=5)
    b = train_unigram(
        _docs(spark, texts).repartition(7), vocab_size=30, max_piece_len=5
    )
    assert a == b


def test_vocab_size_validation(spark):
    docs = _docs(spark, ["abcdefghijklmnopqrstuvwxyz"])
    with pytest.raises(ValueError, match="distinct characters"):
        train_unigram(docs, vocab_size=5)
    with pytest.raises(ValueError, match="positive"):
        train_unigram(docs, vocab_size=0)


def test_viterbi_is_exact_vs_bruteforce_enumeration(toy_model):
    """The Viterbi segmentation must score ≥ EVERY possible segmentation
    (exhaustive enumeration — exactness, not heuristic quality)."""

    def score(pieces):
        s = 0.0
        for p in pieces:
            lp = toy_model.get(p)
            if lp is None:
                if len(p) != 1:
                    return -math.inf
                lp = -100.0
            s += lp
        return s

    def all_segmentations(w):
        if not w:
            yield []
            return
        for i in range(1, len(w) + 1):
            for rest in all_segmentations(w[i:]):
                yield [w[:i]] + rest

    for w in ["lower", "newest", "lowest", "news"]:
        got = unigram_encode_word(w, toy_model)
        best_brute = max(all_segmentations(w), key=score)
        assert abs(score(got) - score(best_brute)) < 1e-12, (w, got, best_brute)


def test_application_plan_is_arrow_only_map(spark, toy_model):
    docs = _docs(spark, ["low lower", "newest low"])
    out = unigram_tokenize(docs, toy_model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_save_load_roundtrip_and_tokenize_parity(spark, tmp_path, toy_model):
    from binance_data_pipeline_spark.operators.unigram import (
        load_unigram,
        save_unigram,
    )

    p = str(tmp_path / "unigram.parquet")
    save_unigram(spark, toy_model, p)
    loaded = load_unigram(spark, p)
    assert loaded == toy_model  # bit-identical log-probs
    docs = _docs(spark, ["lowest newer zebra"])
    a = unigram_tokenize(docs, toy_model).first()["tokens"]
    b = unigram_tokenize(docs, loaded).first()["tokens"]
    assert a == b
