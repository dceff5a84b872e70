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
