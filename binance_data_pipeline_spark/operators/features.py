"""Tabular feature engineering — the fit/transform pairs an ML pipeline
applies before any model sees warehouse rows (scaling, binning,
one-hot, target encoding). The reference computes features ad hoc in
pandas (`producer/build_fact_fee_tax.py:62-63`); these are the general,
leakage-disciplined forms.

Every op is fit/transform split: ``fit_*`` reduces the TRAINING frame
to a small stats artifact (a 1-row aggregate or a per-category table),
``apply_*`` joins/broadcasts it onto ANY frame — so validation and
serving rows are transformed with training statistics, never their own
(the target-leakage rule). Plans stay JVM-side:

- scaling stats are one 1-row aggregate crossJoined back (the benign
  1-row-broadcast pattern used across plans/);
- quantile-bin cut points come from one ``percentile_approx`` row and
  bucket assignment is a map-side CASE chain;
- one-hot categories are a bounded top-k list (driver metadata, like a
  vocabulary) expanded to indicator columns;
- target encoding is a per-category aggregate broadcast-joined back,
  smoothed toward the global mean (the Micci-Barreca 2001 form) so
  rare categories don't memorize their few labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

__all__ = [
    "fit_standard_scaler",
    "apply_standard_scaler",
    "fit_minmax_scaler",
    "apply_minmax_scaler",
    "fit_quantile_bins",
    "apply_quantile_bins",
    "fit_one_hot",
    "apply_one_hot",
    "fit_target_encoding",
    "apply_target_encoding",
]


def fit_standard_scaler(df: DataFrame, cols: list[str]) -> Row:
    """One-row (mean, std) stats per column — the scaler artifact."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"{c}__mean"))
        aggs.append(F.stddev_samp(c).alias(f"{c}__std"))
    return df.agg(*aggs).first()


def apply_standard_scaler(
    df: DataFrame, stats: Row, cols: list[str], suffix: str = "_z"
) -> DataFrame:
    """z = (x − train_mean) / train_std as literal expressions (the
    stats are scalars — zero-variance columns yield NULL, flagged not
    faked)."""
    out = df
    for c in cols:
        mean, std = stats[f"{c}__mean"], stats[f"{c}__std"]
        expr = (
            F.lit(None).cast("double")
            if std is None or std == 0.0
            else (F.col(c) - F.lit(mean)) / F.lit(std)
        )
        out = out.withColumn(f"{c}{suffix}", expr)
    return out


def fit_minmax_scaler(df: DataFrame, cols: list[str]) -> Row:
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
        aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
    return df.agg(*aggs).first()


def apply_minmax_scaler(
    df: DataFrame, stats: Row, cols: list[str], suffix: str = "_01"
) -> DataFrame:
    """x ↦ (x − min)/(max − min) with train-frame bounds; a constant
    column yields NULL. Values outside the training range land outside
    [0, 1] — deliberately not clipped (distribution shift should be
    visible, not hidden)."""
    out = df
    for c in cols:
        lo, hi = stats[f"{c}__min"], stats[f"{c}__max"]
        expr = (
            F.lit(None).cast("double")
            if lo is None or hi is None or hi == lo
            else (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo)
        )
        out = out.withColumn(f"{c}{suffix}", expr)
    return out


def fit_quantile_bins(
    df: DataFrame, col: str, n_bins: int, relative_error: float = 1e-4
) -> list[float]:
    """Interior cut points (n_bins − 1 of them) from one
    percentile_approx row — equal-mass bins at training time."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    qs = [i / n_bins for i in range(1, n_bins)]
    row = df.agg(
        F.expr(
            f"percentile_approx(`{col}`, array({', '.join(str(q) for q in qs)}), "
            f"{int(1 / relative_error)})"
        ).alias("cuts")
    ).first()
    cuts = [float(x) for x in row["cuts"]]
    return cuts


def apply_quantile_bins(
    df: DataFrame, col: str, cuts: list[float], out_col: str | None = None
) -> DataFrame:
    """Map-side bucket id in [0, len(cuts)]: bin b ⇔ cuts[b−1] < x ≤
    cuts[b]. NULL input → NULL bin. A CASE chain over the bounded cut
    list — no shuffle, no sort."""
    out_col = out_col or f"{col}_bin"
    x = F.col(col)
    # bin = number of cut points strictly below x — one flat expression
    expr = (
        sum(((x > F.lit(c)).cast("int") for c in cuts), F.lit(0))
        if cuts
        else F.lit(0)
    )
    return df.withColumn(
        out_col, F.when(x.isNull(), F.lit(None)).otherwise(expr).cast("int")
    )


def fit_one_hot(df: DataFrame, col: str, top_k: int = 20) -> list[str]:
    """The top-k categories by frequency (ties by value — deterministic);
    everything else maps to the OTHER indicator at apply time. Bounded
    driver metadata, like a vocabulary."""
    rows = (
        df.where(F.col(col).isNotNull())
        .groupBy(col)
        .count()
        .orderBy(F.desc("count"), F.asc(col))
        .limit(top_k)
        .collect()
    )
    return [r[col] for r in rows]


def apply_one_hot(
    df: DataFrame, col: str, categories: list[str], other: bool = True
) -> DataFrame:
    """Indicator columns ``{col}__{category}`` (+ ``{col}__other``) as
    map-side CASE expressions — no pivot shuffle, schema fixed by the
    fitted category list so train/serve frames always align."""
    out = df
    for cat in categories:
        safe = "".join(ch if ch.isalnum() else "_" for ch in str(cat))
        out = out.withColumn(
            f"{col}__{safe}", (F.col(col) == F.lit(cat)).cast("int")
        )
    if other:
        lits = F.array(*[F.lit(c) for c in categories])
        out = out.withColumn(
            f"{col}__other",
            (F.col(col).isNotNull() & ~F.array_contains(lits, F.col(col))).cast("int"),
        )
    return out


def fit_target_encoding(
    df: DataFrame, col: str, target_col: str, smoothing: float = 20.0
) -> DataFrame:
    """Per-category smoothed target mean (Micci-Barreca 2001):
    enc = (n·mean_cat + s·mean_global) / (n + s) — rare categories
    shrink toward the global mean instead of memorizing their few
    labels. Returns the (category, encoding) artifact frame; fit on
    TRAIN only and apply everywhere (leakage discipline)."""
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    g = df.agg(F.avg(target_col).alias("g")).first()["g"]
    if g is None:
        raise ValueError(f"{target_col} has no non-null values to encode against")
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("category"))
        .agg(F.count(target_col).alias("n"), F.avg(target_col).alias("m"))
        .select(
            "category",
            (
                (F.col("n") * F.col("m") + F.lit(float(smoothing)) * F.lit(float(g)))
                / (F.col("n") + F.lit(float(smoothing)))
            ).alias("encoding"),
        )
    )


def apply_target_encoding(
    df: DataFrame,
    col: str,
    encoding: DataFrame,
    default: float | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Broadcast-join the fitted encoding onto any frame; unseen
    categories get ``default`` (None = NULL — visible, not silently
    global-mean). The encoding table is category-sized → broadcast, the
    data frame never shuffles."""
    out_col = out_col or f"{col}_te"
    enc = F.broadcast(
        encoding.select(
            F.col("category").alias("__te_cat"), F.col("encoding").alias(out_col)
        )
    )
    joined = df.join(enc, df[col] == enc["__te_cat"], "left").drop("__te_cat")
    if default is not None:
        joined = joined.withColumn(
            out_col, F.coalesce(F.col(out_col), F.lit(float(default)))
        )
    return joined
