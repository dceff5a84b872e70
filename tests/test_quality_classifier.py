"""Trainable quality classifier: learns a separable boundary, loss
descends, scoring is JVM-only with a broadcast model, filter keeps the
high-probability side."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import random

from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.quality_classifier import (
    doc_features,
    filter_by_quality,
    score_quality,
    train_quality_classifier,
)
from binance_data_pipeline_spark.plans.audit import audit_plan, plan_text

GOOD = ["science", "history", "theory", "number", "water", "energy", "music", "light"]
JUNK = ["zxq", "wkj", "vbn", "qqq", "xoxo", "kpd", "mzt", "hjkl"]


def _labeled(spark, n_per_class, seed, prefix=""):
    rng = random.Random(seed)
    rows = [
        (f"{prefix}g{i}", " ".join(rng.choice(GOOD) for _ in range(25)), 1.0)
        for i in range(n_per_class)
    ] + [
        (f"{prefix}j{i}", " ".join(rng.choice(JUNK) for _ in range(25)), 0.0)
        for i in range(n_per_class)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string, label double")


def test_features_are_length_normalized(spark):
    d = spark.createDataFrame(
        [("a", "x x y"), ("b", "x")], "doc_id string, text string"
    )
    rows = doc_features(d, ns=(1,), buckets=100).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r["x"])
    assert abs(sum(by_doc["a"]) - 1.0) < 1e-9
    assert abs(sum(by_doc["b"]) - 1.0) < 1e-9


def test_training_separates_and_loss_descends(spark):
    train = _labeled(spark, 25, seed=1)
    weights, intercept, history = train_quality_classifier(
        train, buckets=500, iterations=12
    )
    assert history[-1] < history[0] * 0.5, history
    # held-out docs from the same two vocabularies
    test = _labeled(spark, 15, seed=2, prefix="t")
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(test, weights, intercept, buckets=500).collect()
    }
    acc = sum(
        1
        for k, p in scored.items()
        if (p >= 0.5) == k.startswith("tg")
    ) / len(scored)
    assert acc >= 0.95, acc


def test_filter_keeps_high_quality_side(spark):
    train = _labeled(spark, 20, seed=3)
    weights, intercept, _ = train_quality_classifier(train, buckets=500, iterations=20)
    pool = _labeled(spark, 10, seed=4, prefix="p").drop("label")
    kept = {
        r["doc_id"]
        for r in filter_by_quality(pool, weights, intercept, 0.5, buckets=500).collect()
    }
    assert kept and all(k.startswith("pg") for k in kept)
    assert len(kept) >= 9  # at most one good doc lost to the boundary


def test_scoring_plan_is_jvm_only_with_broadcast(spark):
    train = _labeled(spark, 5, seed=5)
    weights, intercept, _ = train_quality_classifier(train, buckets=200, iterations=2)
    plan = score_quality(train.drop("label"), weights, intercept, buckets=200)
    findings = [f for f in audit_plan(plan) if f.code in ("PY_ROW_EVAL", "CARTESIAN")]
    assert findings == [], findings
    text = plan_text(plan)
    assert "ArrowEvalPython" not in text and "BatchEvalPython" not in text
    assert "BroadcastHashJoin" in text


def test_training_reproducible(spark):
    train = _labeled(spark, 10, seed=6)
    w1, b1, h1 = train_quality_classifier(train, buckets=300, iterations=5)
    w2, b2, h2 = train_quality_classifier(train, buckets=300, iterations=5)
    assert b1 == b2 and h1 == h2
    assert {(r["bucket"], r["w"]) for r in w1.collect()} == {
        (r["bucket"], r["w"]) for r in w2.collect()
    }


def test_training_matches_numpy_reference(spark):
    """Gradient parity: the distributed GD must track a plain numpy
    logistic regression implementing the same update rule on the same
    features, iteration by iteration."""
    import numpy as np

    from binance_data_pipeline_spark.operators.quality_classifier import doc_features

    train = _labeled(spark, 8, seed=9)
    buckets, iters, lr, mom, l2 = 300, 6, 8.0, 0.9, 1e-4
    weights, intercept, history = train_quality_classifier(
        train, buckets=buckets, iterations=iters, lr=lr, momentum=mom, l2=l2
    )

    feat_rows = doc_features(train, buckets=buckets).collect()
    label_rows = train.select("doc_id", "label").collect()
    ids = sorted({r["id"] for r in feat_rows})
    id_ix = {d: i for i, d in enumerate(ids)}
    bks = sorted({r["bucket"] for r in feat_rows})
    b_ix = {b: i for i, b in enumerate(bks)}
    X = np.zeros((len(ids), len(bks)))
    for r in feat_rows:
        X[id_ix[r["id"]], b_ix[r["bucket"]]] = r["x"]
    y = np.zeros(len(ids))
    for r in label_rows:
        y[id_ix[r["doc_id"]]] = r["label"]

    w = np.zeros(len(bks))
    b0 = 0.0
    vw = np.zeros_like(w)
    v0 = 0.0
    ref_hist = []
    n = len(ids)
    for _ in range(iters):
        z = np.clip(X @ w + b0, -30, 30)
        p = 1.0 / (1.0 + np.exp(-z))
        ref_hist.append(
            float(
                -np.mean(
                    y * np.log(np.maximum(p, 1e-12))
                    + (1 - y) * np.log(np.maximum(1 - p, 1e-12))
                )
            )
        )
        e = p - y
        g0 = e.sum() / n
        gw = X.T @ e / n + l2 * w
        v0 = mom * v0 + g0
        b0 -= lr * v0
        vw = mom * vw + gw
        w -= lr * vw

    assert np.allclose(history, ref_hist, rtol=1e-6, atol=1e-9), (history, ref_hist)
    assert abs(intercept - b0) < 1e-8
    wmap = {r["bucket"]: r["w"] for r in weights.collect()}
    for b, bi in b_ix.items():
        assert abs(wmap.get(b, 0.0) - w[bi]) < 1e-8, (b, wmap.get(b), w[bi])
