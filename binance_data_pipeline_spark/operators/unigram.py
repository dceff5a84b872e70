"""Trainable unigram-LM tokenizer — the SentencePiece counterpart to
``operators/bpe.py`` (Kudo, ACL 2018: "Subword Regularization"). BPE
grows a vocabulary bottom-up by merging; the unigram model starts from a
LARGE candidate set and prunes to ``vocab_size`` under a likelihood
objective, which yields probabilistic segmentations and typically better
rare-word splits.

Distribution of labor (the bpe.py posture):

- **Word counting is distributed**: one hash aggregate
  (``vocab.token_frequencies``), top ``max_word_types`` rows — bounded
  driver state whose dropped tail cannot move the statistics.
- **Training runs on the driver** over that word table (tokenizer
  trainers are inherently sequential; SentencePiece itself is a
  single-process trainer). Seed = most frequent substrings; then
  alternating soft-EM (forward-backward expected piece counts, exact,
  in log space) and lowest-probability pruning down to ``vocab_size``,
  single characters always retained for totality. Fully deterministic:
  every ordering is pinned by (count/prob, piece) sort keys, no RNG.
- **Application is distributed**: an Arrow-batched pandas UDF running
  exact Viterbi segmentation per word with the piece log-probs in a
  SELF-CONTAINED closure (executors never import this package) and a
  per-batch word cache. One map pass, no shuffle.

Losslessness: pieces are literal substrings, so ``concat(pieces) ==
word`` exactly for every word — characters absent from the vocabulary
fall back to single-char tokens at a floor log-prob (used only when
nothing else parses).

North-star extension; the reference has no tokenizer surface.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .vocab import token_frequencies

from ..session import local_rows

__all__ = [
    "train_unigram",
    "unigram_tokenize",
    "unigram_token_count",
    "unigram_encode_word",
]

#: Log-prob assigned to a single-char fallback absent from the model —
#: low enough that Viterbi uses it only when nothing else parses.
_FALLBACK_LOGP = -100.0


def _word_table(
    docs: DataFrame, id_col: str, text_col: str, max_word_types: int
) -> list[tuple[str, int]]:
    rows = (
        token_frequencies(docs, id_col=id_col, text_col=text_col)
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(max_word_types)
        .collect()
    )
    return [(r["token"], int(r["count"])) for r in rows]


def _seed_pieces(
    words: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Most frequent substrings (count-weighted), all single chars kept."""
    counts: dict[str, float] = {}
    for w, c in words:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0.0) + c
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )[: max(0, seed_size - len(chars))]
    return {p: counts[p] for p in sorted(chars) + multi}


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def _em_step(
    words: list[tuple[str, int]], logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """One exact soft-EM pass: forward-backward posterior piece counts
    over every word's segmentation lattice, in log space."""
    expected: dict[str, float] = {}
    for w, c in words:
        L = len(w)
        # forward
        alpha = [-math.inf] * (L + 1)
        alpha[0] = 0.0
        arcs: list[tuple[int, int, float]] = []  # (i, j, logp piece)
        for j in range(1, L + 1):
            acc: list[float] = []
            for i in range(max(0, j - max_piece_len), j):
                lp = logp.get(w[i:j])
                if lp is None:
                    continue
                arcs.append((i, j, lp))
                if alpha[i] > -math.inf:
                    acc.append(alpha[i] + lp)
            if acc:
                m = max(acc)
                alpha[j] = m + math.log(sum(math.exp(a - m) for a in acc))
        if alpha[L] == -math.inf:
            continue  # unparseable under current vocab (no char coverage)
        # backward
        beta = [-math.inf] * (L + 1)
        beta[L] = 0.0
        for i in range(L - 1, -1, -1):
            acc = [
                lp + beta[j]
                for (ii, j, lp) in arcs
                if ii == i and beta[j] > -math.inf
            ]
            if acc:
                m = max(acc)
                beta[i] = m + math.log(sum(math.exp(a - m) for a in acc))
        z = alpha[L]
        for i, j, lp in arcs:
            if alpha[i] > -math.inf and beta[j] > -math.inf:
                post = math.exp(alpha[i] + lp + beta[j] - z)
                if post > 0:
                    p = w[i:j]
                    expected[p] = expected.get(p, 0.0) + post * c
    return expected


def train_unigram(
    docs: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_types: int = 100_000,
    max_piece_len: int = 8,
    seed_multiplier: int = 4,
    em_iters: int = 2,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """Learn a unigram tokenizer; returns {piece: log_prob} — the model
    artifact ``unigram_tokenize`` consumes. Single characters observed in
    the word table are never pruned (totality); ``vocab_size`` must
    leave room for them."""
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    words = _word_table(docs, id_col, text_col, max_word_types)
    if not words:
        raise ValueError("corpus has no tokens to train on")
    chars = sorted({ch for w, _ in words for ch in w})
    if vocab_size < len(chars):
        raise ValueError(
            f"vocab_size {vocab_size} < {len(chars)} distinct characters — "
            f"single chars are never pruned, so the target is unreachable"
        )
    seed = _seed_pieces(words, vocab_size * seed_multiplier, max_piece_len)
    logp = _normalize(seed)

    while True:
        for _ in range(em_iters):
            expected = _em_step(words, logp, max_piece_len)
            # chars must survive even with zero posterior mass this round
            for ch in chars:
                expected.setdefault(ch, 1e-12)
            logp = _normalize(expected)
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = vocab_size - len(chars)
        if n_multi <= target_multi:
            break
        keep_multi = max(target_multi, int(n_multi * (1.0 - prune_frac)))
        ranked = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (-logp[p], p),
        )[:keep_multi]
        logp = _normalize(
            {p: math.exp(lp) for p, lp in logp.items() if len(p) == 1 or p in set(ranked)}
        )
    return logp


def unigram_encode_word(word: str, logp: dict[str, float]) -> list[str]:
    """Exact Viterbi segmentation of one word under the model; unknown
    characters fall back to single-char tokens at a floor log-prob."""
    L = len(word)
    best = [-math.inf] * (L + 1)
    back = [0] * (L + 1)
    best[0] = 0.0
    max_len = max((len(p) for p in logp), default=1)
    for j in range(1, L + 1):
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None and j - i == 1:
                lp = _FALLBACK_LOGP
            if lp is None or best[i] == -math.inf:
                continue
            s = best[i] + lp
            if s > best[j]:
                best[j], back[j] = s, i
    out: list[str] = []
    j = L
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def _apply_udf(logp: dict[str, float]):
    # Self-contained closure (the bpe.py convention): executors must not
    # need this package importable, so the Viterbi loop is restated.
    model = dict(logp)
    max_len = max((len(p) for p in model), default=1)
    floor = -100.0

    def encode_word(word: str) -> list[str]:
        L = len(word)
        best = [float("-inf")] * (L + 1)
        back = [0] * (L + 1)
        best[0] = 0.0
        for j in range(1, L + 1):
            for i in range(max(0, j - max_len), j):
                lp = model.get(word[i:j])
                if lp is None and j - i == 1:
                    lp = floor
                if lp is None or best[i] == float("-inf"):
                    continue
                s = best[i] + lp
                if s > best[j]:
                    best[j], back[j] = s, i
        out = []
        j = L
        while j > 0:
            i = back[j]
            out.append(word[i:j])
            j = i
        return out[::-1]

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


def unigram_tokenize(
    docs: DataFrame,
    model: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>): Viterbi segmentation of every document
    — one Arrow-batched map pass, no shuffle."""
    if not model:
        raise ValueError("empty unigram model")
    enc = _apply_udf(model)
    return docs.select(F.col(id_col).alias(id_col), enc(F.col(text_col)).alias("tokens"))


def unigram_token_count(
    docs: DataFrame,
    model: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens) under the trained model — real subword accounting
    for budgets/packing/chunking, like bpe_token_count."""
    toks = unigram_tokenize(docs, model, id_col, text_col)
    return toks.select(id_col, F.size("tokens").cast("long").alias("n_tokens"))


def save_unigram(spark, model: dict[str, float], path: str) -> None:
    """Persist the model as a parquet artifact (piece, log_prob) — one
    small file, inspectable by any reader, shipped beside the corpus."""
    local_rows(
        spark, sorted(model.items()), "piece string, log_prob double"
    ).write.mode("overwrite").parquet(path)


def load_unigram(spark, path: str) -> dict[str, float]:
    """Load a persisted unigram model; bit-identical to what was saved."""
    return {r["piece"]: r["log_prob"] for r in spark.read.parquet(path).collect()}
