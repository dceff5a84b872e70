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


def test_training_matches_numpy_reference(spark):
    """Gradient parity: the distributed GD must track a plain numpy
    softmax-regression implementing the same update rule on the same
    features, to float tolerance, iteration by iteration."""
    import numpy as np

    from binance_data_pipeline_spark.operators.langid import _features

    train = _docs(spark, 6, seed=4)
    buckets, iters, lr, mom, l2 = 300, 5, 8.0, 0.9, 1e-4
    weights, intercepts, classes, history = train_langid(
        train, buckets=buckets, iterations=iters, lr=lr, momentum=mom, l2=l2
    )

    feat_rows = _features(train, "doc_id", "text", buckets, 3).collect()
    label_rows = train.select("doc_id", "lang").collect()
    ids = sorted({r["id"] for r in feat_rows})
    id_ix = {d: i for i, d in enumerate(ids)}
    buckets_seen = sorted({r["bucket"] for r in feat_rows})
    b_ix = {b: i for i, b in enumerate(buckets_seen)}
    X = np.zeros((len(ids), len(buckets_seen)))
    for r in feat_rows:
        X[id_ix[r["id"]], b_ix[r["bucket"]]] = r["x"]
    cls_ix = {c: i for i, c in enumerate(classes)}
    Y = np.zeros((len(ids), len(classes)))
    for r in label_rows:
        Y[id_ix[r["doc_id"]], cls_ix[r["lang"]]] = 1.0

    W = np.zeros((len(buckets_seen), len(classes)))
    B = np.zeros(len(classes))
    vW = np.zeros_like(W)
    vB = np.zeros_like(B)
    ref_hist = []
    n = len(ids)
    for _ in range(iters):
        Z = X @ W + B
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        ref_hist.append(float(-(Y * np.log(np.maximum(P, 1e-12))).sum() / n))
        E = P - Y
        gB = E.sum(axis=0) / n
        gW = X.T @ E / n + l2 * W
        vB = mom * vB + gB
        B -= lr * vB
        vW = mom * vW + gW
        W -= lr * vW

    assert np.allclose(history, ref_hist, rtol=1e-6, atol=1e-9), (history, ref_hist)
    for c, i in cls_ix.items():
        assert abs(intercepts[c] - B[i]) < 1e-8
    wmap = {r["bucket"]: dict(r["w"]) for r in weights.collect()}
    for b, bi in b_ix.items():
        for c, ci in cls_ix.items():
            got = wmap.get(b, {}).get(c, 0.0)
            assert abs(got - W[bi, ci]) < 1e-8, (b, c, got, W[bi, ci])
