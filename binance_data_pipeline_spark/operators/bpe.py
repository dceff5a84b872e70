"""Trainable byte-pair encoding — real subword tokenization for the
corpus pipeline (token budgets, packing, chunking all speak "tokens";
``text.bpe_ish_token_count`` approximates a tokenizer with a regex, this
module trains one).

The algorithm is Sennrich et al. (ACL 2016) word-level BPE:

- **Word counting is distributed**: one hash aggregate over the corpus
  (``vocab.token_frequencies``) keeps the top ``max_word_types`` word
  forms with counts. Driver state is that word-frequency table —
  bounded by construction, and the tail it drops is irrelevant to merge
  statistics (a word type seen twice in 100 TB cannot influence the
  first thousands of merges).
- **The merge loop runs on the driver** over the word table (the same
  posture as every tokenizer trainer in practice — GPT-2's BPE trained
  on a single machine; merge selection is inherently sequential).
  Deterministic: ties in pair frequency break lexicographically.
- **Application is distributed**: an Arrow-batched pandas UDF with the
  merge ranks in its closure encodes each word greedily (lowest-rank
  merge first — the standard GPT-2 ``get_pairs``/min-rank loop), with a
  per-batch word cache (Zipf makes the hit rate ~99%). One map pass, no
  shuffle, no driver involvement.

End-of-word marker ``</w>`` preserves word boundaries, so
``concat(tokens) == word + '</w>'`` exactly — detokenization is lossless
at the word level (whitespace normalization is the tokenizer's contract,
as in the paper).

North-star extension; the reference has no tokenizer surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .vocab import token_frequencies

from ..session import local_rows

__all__ = ["train_bpe", "bpe_tokenize", "bpe_token_count", "bpe_encode_word"]

_EOW = "</w>"


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_types: int = 100_000,
    tokenizer: str = "whitespace",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list — rank = position, the model artifact
    ``bpe_tokenize`` consumes. Word counting is one distributed
    aggregate; the merge loop is driver-side over ≤ ``max_word_types``
    word rows (documented bounded-metadata posture)."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    freq_rows = (
        token_frequencies(docs, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(max_word_types)
        .collect()
    )
    # word -> (symbol tuple, count); symbols start as chars + end marker
    words: dict[tuple[str, ...], int] = {}
    for r in freq_rows:
        sym = tuple(r["token"]) + (_EOW,)
        words[sym] = words.get(sym, 0) + int(r["count"])

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # max count, ties broken lexicographically -> deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing repeats; further merges are noise
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + c
        words = new_words
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy min-rank BPE encoding of one word (chars + ``</w>`` start
    state; repeatedly merge the lowest-rank adjacent pair)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def _apply_udf(merges: list[tuple[str, str]], tokenizer: str):
    ranks = {pair: i for i, pair in enumerate(merges)}
    if tokenizer != "whitespace":
        raise ValueError("bpe application supports the whitespace tokenizer")

    # NOTE: the closure must be self-contained (no references to this
    # module's globals — cloudpickle ships those BY REFERENCE and the
    # executors need not have the package importable), so the encode
    # loop is restated here rather than calling bpe_encode_word.
    def encode_word(word: str) -> list[str]:
        sym = list(word) + ["</w>"]
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return sym

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").split():
                enc = cache.get(w)
                if enc is None:
                    enc = encode_word(w)
                    cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return _encode


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(id, tokens array<string>): the trained tokenizer applied to every
    document — one Arrow-batched map pass (merge ranks in the closure,
    per-batch word cache), no shuffle."""
    enc = _apply_udf(merges, tokenizer)
    return docs.select(F.col(id_col).alias(id_col), enc(F.col(text_col)).alias("tokens"))


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(id, n_tokens): subword count under the trained tokenizer — the
    real token accounting for budgets/packing/chunking (replaces the
    regex approximation when a trained model exists)."""
    toks = bpe_tokenize(docs, merges, id_col, text_col, tokenizer)
    return toks.select(id_col, F.size("tokens").cast("long").alias("n_tokens"))


def save_bpe(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge list as a parquet artifact (rank, left, right) —
    the model travels with the corpus it tokenized, and any Spark/DuckDB
    reader can inspect it. One small file."""
    local_rows(
        spark, [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    ).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    """Load a persisted merge list, rank order restored exactly."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]
