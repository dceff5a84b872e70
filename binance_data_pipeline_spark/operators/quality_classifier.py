"""Trainable model-based quality filter — the FineWeb-Edu / fastText
recipe (Penedo et al. 2024; Joulin et al. 2016): a linear classifier
over hashed n-gram features, trained on a labeled slice (human or
LLM-annotated "educational/high-quality" vs "junk"), then applied to
the full crawl. Complements the static scorers: quality_rules.py is
hand-written heuristics, lm_score.py is target-corpus fluency, dsir.py
matches a target distribution — this one learns an arbitrary labeled
boundary.

Spark-first shape:

- **Features** are the same hashed n-gram buckets as dsir.py
  (xxhash64 → pmod, unigram+bigram, JVM higher-order functions),
  length-normalized per doc (x_b = count_b / n_grams).
- **Training** is logistic regression by full-batch gradient descent
  with momentum, where each iteration is two DataFrame aggregations
  over the labeled set: forward = explode → broadcast-join weights →
  per-doc sum → sigmoid; backward = join the per-doc error back to the
  gram table → per-bucket sum. Driver state is the weight vector
  (≤ ``buckets`` floats) and per-iteration loss — never the corpus.
  The labeled set is re-read each iteration, so it should be cached or
  small (labeled data is, by construction). Deterministic: no RNG
  anywhere — zero init, fixed iteration count, hash features.
- **Scoring** the 100 TB corpus is one explode → broadcast hash join →
  keyed aggregate → sigmoid: the lm_score/dsir plan shape, no Python.

A 10k-bucket unigram+bigram linear model is exactly fastText's
architecture (minus the embedding average, which at quantized scale
reduces to the same linear form) — the published quality filters
(FineWeb-Edu's, RefinedWeb's) are this plus a fancier labeler.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import hashed_ngram_buckets

__all__ = [
    "doc_features",
    "train_quality_classifier",
    "score_quality",
    "filter_by_quality",
]


def doc_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2),
    buckets: int = 10_000,
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(id, bucket, x): length-normalized hashed-gram features, one row
    per (doc, distinct bucket). Docs with zero grams are absent."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(hashed_ngram_buckets(text_col, ns, buckets, tokenizer)).alias("bucket"),
    )
    counts = grams.groupBy("id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("id").agg(F.sum("c").alias("n"))
    return counts.join(totals, "id").select(
        "id", "bucket", (F.col("c") / F.col("n")).alias("x")
    )


def _weights_df(spark, weights: dict[int, float]) -> DataFrame:
    if not weights:
        return spark.createDataFrame([], "bucket int, w double")
    return spark.createDataFrame(
        [(int(b), float(w)) for b, w in weights.items()], "bucket int, w double"
    )


def train_quality_classifier(
    labeled_docs: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2),
    buckets: int = 10_000,
    iterations: int = 40,
    lr: float = 8.0,
    momentum: float = 0.9,
    l2: float = 1e-4,
    tokenizer: str = "whitespace",
) -> tuple[DataFrame, float, list[float]]:
    """Fit the linear model on (text, label∈{0,1}) rows. Returns
    (weights_df(bucket, w), intercept, loss_history) — weights_df is the
    broadcastable model; loss_history is mean log-loss per iteration
    (monotone-ish descent is the convergence check).

    Each iteration: one forward pass (per-doc probability) and one
    gradient pass (per-bucket error sum) — two shuffles over the labeled
    set, which is cached up front. Momentum + a high base rate suit the
    length-normalized features (each |x| row sums to 1)."""
    spark = labeled_docs.sparkSession
    feats = doc_features(
        labeled_docs, id_col, text_col, ns, buckets, tokenizer
    ).localCheckpoint(eager=True)
    labels = labeled_docs.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
    ).localCheckpoint(eager=True)
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("train_quality_classifier needs at least one labeled doc")

    weights: dict[int, float] = {}
    vel: dict[int, float] = {}
    intercept, v0 = 0.0, 0.0
    history: list[float] = []
    for _ in range(iterations):
        wdf = _weights_df(spark, weights)
        z = (
            feats.join(F.broadcast(wdf), "bucket", "left")
            .groupBy("id")
            .agg(F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("x")).alias("wx"))
        )
        scored = labels.join(z, "id", "left").select(
            "id",
            "y",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -F.greatest(
                            F.lit(-30.0),
                            F.least(
                                F.lit(30.0),
                                F.coalesce(F.col("wx"), F.lit(0.0)) + F.lit(intercept),
                            ),
                        )
                    )
                )
            ).alias("p"),
        )
        err = scored.select(
            "id",
            (F.col("p") - F.col("y")).alias("e"),
            (
                -(
                    F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                    + (1 - F.col("y"))
                    * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                )
            ).alias("ll"),
        )
        # per-bucket gradient + intercept gradient + loss in one pass set
        grad_rows = (
            feats.join(err, "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("e") * F.col("x")).alias("g"))
            .collect()
        )
        agg = err.agg(F.sum("e").alias("ge"), F.avg("ll").alias("loss")).first()
        history.append(float(agg["loss"]))
        g0 = float(agg["ge"]) / n_docs
        v0 = momentum * v0 + g0
        intercept -= lr * v0
        for r in grad_rows:
            b = r["bucket"]
            g = float(r["g"]) / n_docs + l2 * weights.get(b, 0.0)
            vel[b] = momentum * vel.get(b, 0.0) + g
            weights[b] = weights.get(b, 0.0) - lr * vel[b]
    return _weights_df(spark, weights), intercept, history


def score_quality(
    docs: DataFrame,
    weights: DataFrame,
    intercept: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2),
    buckets: int = 10_000,
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(id, n_grams, quality_prob): sigmoid of the linear score under the
    trained model — one explode → broadcast join → keyed aggregate, no
    Python. Docs with zero grams are absent (no evidence).

    ``ns``/``buckets``/``tokenizer`` MUST match the training call: the
    model is indexed by hashed feature ids, and a different geometry
    scatters the weights silently (scores collapse toward the
    intercept)."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(hashed_ngram_buckets(text_col, ns, buckets, tokenizer)).alias("bucket"),
    )
    counts = grams.groupBy("id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    joined = counts.join(F.broadcast(weights), "bucket", "left")
    per_doc = joined.groupBy("id").agg(
        F.sum("c").alias("n_grams"),
        F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("c")).alias("wc"),
    )
    z = F.greatest(
        F.lit(-30.0),
        F.least(F.lit(30.0), F.col("wc") / F.col("n_grams") + F.lit(float(intercept))),
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_grams",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("quality_prob"),
    )


def filter_by_quality(
    docs: DataFrame,
    weights: DataFrame,
    intercept: float,
    min_prob: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2),
    buckets: int = 10_000,
    tokenizer: str = "whitespace",
) -> DataFrame:
    """Keep docs the model scores ≥ ``min_prob`` (FineWeb-Edu keeps
    score ≥ 3/5 ≈ the upper probability band). Unscoreable docs (zero
    grams) are dropped."""
    scores = score_quality(
        docs, weights, intercept, id_col, text_col, ns, buckets, tokenizer
    )
    keep = scores.where(F.col("quality_prob") >= min_prob).select(
        F.col(id_col).alias("__keep_id")
    )
    return docs.join(keep, docs[id_col] == F.col("__keep_id"), "left_semi")
