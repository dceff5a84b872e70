"""Corpus vocabulary statistics: token / n-gram frequency tables, top-k
vocabularies, and IDF weights — the counting passes that precede BPE
vocab construction and TF-IDF featurization over a training corpus.

Scale shape: one generator (posexplode of the per-doc token array,
materialized in its own projection so the array is built once per doc,
not once per emitted row — see operators/dedup.py's interpreted-HOF
note) followed by ONE hash aggregation on the token key. Partial
aggregation (map-side combine) is what makes this safe at 100 TB: the
heavy hitters ("the", "of") collapse to one partial row per task before
the exchange, so token skew — the most skewed distribution in NLP —
never concentrates on a reducer. Document frequencies use
approx_count_distinct by default (a mergeable HLL sketch riding the
same aggregation); exact mode adds a distinct pre-pass for callers that
need it at small scale.

No reference equivalent (the reference has no text processing) — part
of the LLM-pipeline extension surface with operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import BPE_ISH_PATTERN, tokens


def _token_array(text_col: str, tokenizer: str) -> Column:
    if tokenizer == "whitespace":
        return tokens(text_col)
    if tokenizer == "bpe_ish":
        return F.regexp_extract_all(
            F.col(text_col), F.lit(BPE_ISH_PATTERN), 0
        )
    raise ValueError(f"tokenizer must be 'whitespace' or 'bpe_ish', got {tokenizer!r}")


def _ngram_array(tk: Column, n: int) -> Column:
    """Sliding word n-grams of a token array (docs shorter than n yield
    none)."""
    if n == 1:
        return tk
    idx = F.when(
        F.size(tk) >= n, F.sequence(F.lit(1), F.size(tk) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, n)))


def token_frequencies(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
    n: int = 1,
    min_count: int = 1,
    exact_doc_freq: bool = False,
) -> DataFrame:
    """(token, count, doc_count) over the corpus — term frequency plus
    per-document incidence for every token (or word n-gram when n>1).

    ``doc_count`` is an HLL estimate (±2% default rsd) unless
    ``exact_doc_freq``; exact mode inserts a (token, id) distinct —
    a second shuffle — and is meant for small-corpus validation."""
    base = df.select(
        F.col(id_col).alias("id"),
        _ngram_array(_token_array(text_col, tokenizer), n).alias("tk"),
    )
    pairs = base.select("id", F.explode("tk").alias("token"))
    if exact_doc_freq:
        per_doc = pairs.groupBy("token", "id").agg(
            F.count(F.lit(1)).alias("c")
        )
        out = per_doc.groupBy("token").agg(
            F.sum("c").alias("count"),
            F.count(F.lit(1)).cast("long").alias("doc_count"),
        )
    else:
        out = pairs.groupBy("token").agg(
            F.count(F.lit(1)).alias("count"),
            F.approx_count_distinct("id").alias("doc_count"),
        )
    return out.where(F.col("count") >= min_count)


def build_vocab(
    df: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "bpe_ish",
    min_count: int = 2,
) -> DataFrame:
    """Top-``vocab_size`` tokens by corpus frequency with deterministic
    rank (count desc, token asc — ties can't reorder between runs).
    Plans as TakeOrderedAndProject over the single-shuffle frequency
    table: per-partition top-k, then a merge of k rows per partition —
    never a full sort of the vocabulary. The token_id numbering window
    runs AFTER the limit, over vocab_size rows only (a single small
    partition by construction, not a corpus-wide single-partition
    window)."""
    freq = token_frequencies(
        df, id_col=id_col, text_col=text_col, tokenizer=tokenizer,
        min_count=min_count,
    )
    ranked = freq.orderBy(F.desc("count"), F.asc("token")).limit(vocab_size)
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return ranked.select(
        "token",
        "count",
        "doc_count",
        (F.row_number().over(w) - 1).cast("long").alias("token_id"),
    )


def idf_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
    min_doc_count: int = 1,
) -> DataFrame:
    """(token, doc_count, idf) with smoothed idf = ln((N+1)/(df+1)) + 1
    (scikit-learn's smooth_idf convention, so results are comparable to
    the standard implementation). N is one scalar count — O(1) driver
    data."""
    n_docs = df.select(id_col).count()
    freq = token_frequencies(
        df, id_col=id_col, text_col=text_col, tokenizer=tokenizer
    )
    return (
        freq.where(F.col("doc_count") >= min_doc_count)
        .select(
            "token",
            "doc_count",
            F.round(
                F.log((F.lit(float(n_docs + 1))) / (F.col("doc_count") + 1)) + 1.0, 6
            ).alias("idf"),
        )
    )
