"""Trainable language ID: separates three synthetic 'languages' by
character n-grams, loss descends, scoring is deterministic and JVM-only,
geometry validation."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import random

import pytest

from binance_data_pipeline_spark.operators.langid import (
    char_ngram_buckets,
    score_langid,
    train_langid,
)
from binance_data_pipeline_spark.plans.audit import audit_plan, plan_text

# three orthographically distinct synthetic languages
VOCAB = {
    "aa": ["kala", "talo", "meri", "kivi", "lumi", "suo", "joki", "ranta"],
    "bb": ["zorth", "xylph", "qwyrm", "vrynx", "zylko", "wyrth", "xophz", "qyrzl"],
    "cc": ["bella", "corso", "mondo", "porta", "strada", "fiore", "notte", "mare"],
}


def _docs(spark, n_per_lang, seed, prefix=""):
    rng = random.Random(seed)
    rows = []
    for lang, words in VOCAB.items():
        for i in range(n_per_lang):
            rows.append(
                (f"{prefix}{lang}{i}", " ".join(rng.choice(words) for _ in range(12)), lang)
            )
    return spark.createDataFrame(rows, "doc_id string, text string, lang string")


def test_char_ngrams_shape(spark):
    d = spark.createDataFrame([("a", "abcd")], "doc_id string, text string")
    row = d.select(char_ngram_buckets("text", n=3, buckets=100).alias("g")).first()
    assert len(row["g"]) == 2  # 'abc', 'bcd'
    assert all(0 <= b < 100 for b in row["g"])


def test_train_and_score_three_languages(spark):
    train = _docs(spark, 12, seed=1)
    weights, intercepts, classes, history = train_langid(
        train, buckets=800, iterations=10
    )
    assert classes == ["aa", "bb", "cc"]
    assert history[-1] < history[0] * 0.5, history

    test = _docs(spark, 6, seed=2, prefix="t")
    scored = {
        r["doc_id"]: (r["lang"], r["confidence"])
        for r in score_langid(test, weights, intercepts, classes, buckets=800).collect()
    }
    acc = sum(
        1 for k, (lang, _) in scored.items() if k.startswith(f"t{lang}")
    ) / len(scored)
    assert acc >= 0.94, acc
    assert all(0 < c <= 1 for _, c in scored.values())


def test_scoring_plan_is_jvm_only(spark):
    train = _docs(spark, 4, seed=3)
    weights, intercepts, classes, _ = train_langid(train, buckets=300, iterations=2)
    plan = score_langid(train, weights, intercepts, classes, buckets=300)
    findings = [f for f in audit_plan(plan) if f.code in ("PY_ROW_EVAL",)]
    assert findings == [], findings
    text = plan_text(plan)
    assert "ArrowEvalPython" not in text and "BatchEvalPython" not in text


def test_single_class_rejected(spark):
    one = spark.createDataFrame(
        [("a", "kala talo", "aa"), ("b", "meri kivi", "aa")],
        "doc_id string, text string, lang string",
    )
    with pytest.raises(ValueError, match="classes"):
        train_langid(one, buckets=100, iterations=1)
