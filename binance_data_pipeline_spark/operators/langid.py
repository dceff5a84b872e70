"""Trainable language identification — the fastText-langid shape
(Joulin et al. 2016; langid.py, Lui & Baldwin 2012): a multinomial
logistic model over hashed character/word n-gram features, trained on
labeled text. Complements ``text.lang_guess`` (a fixed stopword
heuristic): the trained model covers whatever languages the labels
cover, at whatever granularity the labeler chose.

This generalizes quality_classifier.py's binary GD to softmax:

- **Features**: hashed n-gram buckets (dsir.hashed_ngram_buckets).
  For language ID, CHARACTER n-grams carry most of the signal
  (orthography beats vocabulary for short inputs) — ``char_ngrams``
  switches the tokenizer to per-character grams, still one JVM
  expression.
- **Training** (full-batch GD + momentum): forward = explode →
  broadcast-join (bucket, lang, w) → per-(doc, lang) sum → per-doc
  softmax (one window over the k class rows); backward = join the
  per-(doc, lang) error to the gram table → per-(bucket, lang) sum.
  Driver state: the (≤ buckets × n_classes) weight dict. Deterministic:
  zero init, fixed iterations, no RNG.
- **Scoring**: the forward pass + argmax — JVM-only, broadcast model.

The cross-entropy history returned by training is the convergence
check, as in quality_classifier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dsir import hashed_ngram_buckets

__all__ = ["char_ngram_buckets", "train_langid", "score_langid"]


def char_ngram_buckets(
    text_col: str, n: int = 3, buckets: int = 5_000
) -> Column:
    """array<int> of hashed character n-gram buckets — the langid
    feature map (orthographic units, not words). One JVM expression:
    substring windows over the lowercased text."""
    t = F.lower(F.col(text_col))
    idx = F.when(
        F.length(t) >= n, F.sequence(F.lit(1), F.length(t) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: t.substr(i, F.lit(n)))
    return F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(buckets)).cast("int"))


def _features(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int,
    char_n: int | None,
) -> DataFrame:
    """(id, bucket, x) length-normalized features — char n-grams when
    ``char_n``, else word unigram+bigram (the DSIR map)."""
    feat = (
        char_ngram_buckets(text_col, char_n, buckets)
        if char_n is not None
        else hashed_ngram_buckets(text_col, (1, 2), buckets)
    )
    grams = docs.select(F.col(id_col).alias("id"), F.explode(feat).alias("bucket"))
    counts = grams.groupBy("id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("id").agg(F.sum("c").alias("n"))
    return counts.join(totals, "id").select(
        "id", "bucket", (F.col("c") / F.col("n")).alias("x")
    )


def _forward(
    feats: DataFrame, wdf: DataFrame, classes: list[str], intercepts: dict[str, float]
) -> DataFrame:
    """(id, lang, p): softmax class probabilities per doc. The class
    axis is a literal k-row explode, so the window normalization runs
    over exactly k rows per doc."""
    spark = feats.sparkSession
    cls = spark.createDataFrame(
        [(c, float(intercepts.get(c, 0.0))) for c in classes], "lang string, b double"
    )
    z = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .select("id", "x", F.explode(F.col("w")).alias("lang", "wv"))
        .groupBy("id", "lang")
        .agg(F.sum(F.col("wv") * F.col("x")).alias("wx"))
    )
    # docs × classes grid (a doc may have no weight hits for a class).
    # The crossJoin broadcasts a k-ROW class dim — the audit flags it as
    # a warn-level BroadcastNestedLoopJoin, which is the benign literal-
    # dim pattern (quality_rules' scalar-default dim), not an O(n·m) pair
    grid = feats.select("id").distinct().crossJoin(F.broadcast(cls))
    zfull = grid.join(z, ["id", "lang"], "left").select(
        "id", "lang",
        (F.coalesce(F.col("wx"), F.lit(0.0)) + F.col("b")).alias("zz"),
    )
    wcls = Window.partitionBy("id")
    zmax = F.max("zz").over(wcls)
    ez = F.exp(F.col("zz") - zmax)
    return zfull.withColumn("p", ez / F.sum(ez).over(wcls)).select("id", "lang", "p")


def _weights_df(spark, weights: dict[int, dict[str, float]]) -> DataFrame:
    rows = [
        (b, {c: float(v) for c, v in per.items()}) for b, per in weights.items()
    ]
    if not rows:
        return spark.createDataFrame([], "bucket int, w map<string,double>")
    return spark.createDataFrame(rows, "bucket int, w map<string,double>")


def train_langid(
    labeled_docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 5_000,
    char_n: int | None = 3,
    iterations: int = 25,
    lr: float = 8.0,
    momentum: float = 0.9,
    l2: float = 1e-4,
) -> tuple[DataFrame, dict[str, float], list[str], list[float]]:
    """Fit the multinomial model. Returns (weights_df(bucket,
    w: map<lang,double>), intercepts, classes, loss_history). Feature
    geometry (``buckets``/``char_n``) must match at scoring time."""
    spark = labeled_docs.sparkSession
    feats = _features(labeled_docs, id_col, text_col, buckets, char_n).localCheckpoint(
        eager=True
    )
    labels = labeled_docs.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("y")
    ).localCheckpoint(eager=True)
    classes = sorted(r["y"] for r in labels.select("y").distinct().collect())
    if len(classes) < 2:
        raise ValueError(f"need >= 2 classes, got {classes}")
    n_docs = labels.count()

    weights: dict[int, dict[str, float]] = {}
    vel: dict[tuple[int, str], float] = {}
    intercepts = {c: 0.0 for c in classes}
    v0 = {c: 0.0 for c in classes}
    history: list[float] = []
    for _ in range(iterations):
        wdf = _weights_df(spark, weights)
        probs = _forward(feats, wdf, classes, intercepts)
        err = probs.join(labels, "id").select(
            "id", "lang",
            (F.col("p") - F.when(F.col("lang") == F.col("y"), 1.0).otherwise(0.0)).alias("e"),
            F.when(F.col("lang") == F.col("y"), -F.log(F.greatest(F.col("p"), F.lit(1e-12)))).alias("ll"),
        )
        agg = err.agg(F.sum("ll").alias("loss")).first()
        history.append(float(agg["loss"]) / n_docs)
        g0 = {
            r["lang"]: float(r["ge"]) / n_docs
            for r in err.groupBy("lang").agg(F.sum("e").alias("ge")).collect()
        }
        grad_rows = (
            feats.join(err, "id")
            .groupBy("bucket", "lang")
            .agg(F.sum(F.col("e") * F.col("x")).alias("g"))
            .collect()
        )
        for c in classes:
            v0[c] = momentum * v0[c] + g0.get(c, 0.0)
            intercepts[c] -= lr * v0[c]
        for r in grad_rows:
            b, c = r["bucket"], r["lang"]
            w_bc = weights.get(b, {}).get(c, 0.0)
            g = float(r["g"]) / n_docs + l2 * w_bc
            vel[(b, c)] = momentum * vel.get((b, c), 0.0) + g
            weights.setdefault(b, {})[c] = w_bc - lr * vel[(b, c)]
    return _weights_df(spark, weights), intercepts, classes, history


def score_langid(
    docs: DataFrame,
    weights: DataFrame,
    intercepts: dict[str, float],
    classes: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 5_000,
    char_n: int | None = 3,
) -> DataFrame:
    """(id, lang, confidence): the argmax class per doc with its softmax
    probability — JVM-only (broadcast model, window argmax). Docs with
    zero features are absent. Geometry must match training."""
    feats = _features(docs, id_col, text_col, buckets, char_n)
    probs = _forward(feats, weights, classes, intercepts)
    w = Window.partitionBy("id").orderBy(F.col("p").desc(), F.col("lang"))
    return (
        probs.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("lang"),
            F.round(F.col("p"), 4).alias("confidence"),
        )
    )
