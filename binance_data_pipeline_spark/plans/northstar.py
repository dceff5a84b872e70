"""North-star queries: text analysis, dedup, similarity search over the
``documents`` and ``embeddings`` tables.

Oracle-checked where DuckDB can express the same semantics; the LSH-family
operators (MinHash banding, SimHash blocking, random-projection ANN) are
Spark-only entries → the driver records rows-only checks, and tests/ pin
their behavior against exact recomputation at small scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as T
from ..operators.text import STOPWORDS



def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per document — whitespace AND BPE-ish pre-tokenizer
    counts — rolled up per (lang, source): the token-budget view of the
    corpus, one map-side feature pass + one small shuffle. (Absorbed the
    former doc_bpe_tokens entry so the catalog slot could fund the Q2
    min-cost-supplier shape; both token operators stay exercised.)"""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("n_tokens", T.token_count("text"))
        .withColumn("bpe_tokens", T.bpe_ish_token_count("text"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            F.round(F.avg(F.col("bpe_tokens") / F.col("n_tokens")), 4).alias("bpe_per_word"),
        )
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/token-shape heuristics per doc,
    aggregated per lang."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        T.token_count("text").alias("n_tokens"),
        T.punct_ratio("text").alias("pr"),
        T.quality_score("text").alias("q"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("pr"), 4).alias("avg_punct_ratio"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
        F.round(F.min("q"), 4).alias("min_quality"),
    )


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID (stopword argmax) vs the labeled lang —
    confusion counts."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("lang_guess", T.lang_guess("text"))
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_doc_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup dedup DECISION table: every doc mapped to the canonical
    keeper (smallest doc_id) of its normalized-fingerprint cluster, with
    cluster width and an is_dup flag. One row per doc — the shape a
    downstream corpus writer consumes (keep where doc_id = keeper), and
    non-degenerate at every SF (the earlier clusters-only form returned 0
    rows at small SFs where the synthetic corpus has no exact dups, which
    made its oracle match vacuous). fingerprint_normalized catches
    formatting-only dups (case/whitespace) on top of byte-exact ones."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("fp")
    return (
        d.withColumn("fp", T.fingerprint_normalized("text"))
        .select(
            "doc_id",
            F.min("doc_id").over(w).alias("keeper_doc_id"),
            F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        )
        .withColumn("is_dup", F.col("doc_id") != F.col("keeper_doc_id"))
    )


def q_embed_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 cosine neighbors for the first 10 vectors (brute-force
    baseline; broadcast queries × corpus scan)."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_brute(e.where(F.col("vec_id") < 10), e, k=3)


#: (cache key) -> (corpus fingerprint, (recall, ok)) — see _with_recall.
_RECALL_MEMO: dict[str, tuple[str, tuple[float, bool]]] = {}


def _with_recall(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    qname: str,
    params: str,
    result: DataFrame,
    approx: DataFrame,
    exact_fn,
    keys: list[str],
    floor: float,
) -> DataFrame:
    """Self-validating evidence for the rows-only catalog entries (no DuckDB
    oracle can express LSH banding internals): every output row carries
    ``recall_vs_exact`` — |approx ∩ exact| / |exact| over a bounded
    sample — and ``recall_ok`` = recall ≥ floor, so CORRECTNESS rows show
    an asserted quality number instead of a bare count. Recall is 1.0 by
    convention when the sample holds no exact positives.

    The summary is BUILD-ONCE per (sf_dir, query, params, corpus
    fingerprint) — same amortization contract as the IVF index: recall over
    a static corpus is a property of the corpus, so it is computed on first
    touch, persisted as one fingerprint-guarded JSON sidecar, and every
    later call (including bench re-passes and repeat driver runs) serves
    the cached row and skips the exact-side computation entirely. A
    regenerated corpus changes the fingerprint and forces a rebuild. The
    miss-path exact side is always sample-bounded, never full-corpus O(n²).
    The sidecar is plain driver-side file I/O (tempdir is local by
    construction), so a warm serve pays ZERO Spark jobs — the r12 shape
    read a one-row parquet back through a full Spark job per no-oracle
    query per process (VERDICT r12 task 5).

    STRICT BY DEFAULT: a recall below the floor RAISES instead of just
    flagging ``recall_ok=false`` — the evidence column is an assertion,
    so a banding/parameter change that silently tanks recall fails the
    driver's correctness run, not just a local pytest floor (cache hits
    are checked too). Set ``BDP_STRICT_RECALL=0`` to opt back down to
    flag-only (exploratory parameter sweeps)."""
    import hashlib
    import json
    import tempfile

    from ..operators.ivf import corpus_fingerprint

    fp = corpus_fingerprint(load_table(spark, sf_dir, table), f"{qname}|{params}")
    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|{qname}|{params}".encode()
    ).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), f"bdp_recall_{key}.json")
    # in-process memo in front of the sidecar (fp-validated, so a
    # regenerated corpus still invalidates); saves even the file read on
    # repeat calls in one session (bench pass 2, repeated driver runs)
    memo = _RECALL_MEMO.get(key)
    cached_row = memo[1] if memo is not None and memo[0] == fp else None
    if cached_row is None:
        try:
            with open(cache) as f:
                d = json.load(f)
            if d.get("fingerprint") == fp:
                cached_row = (float(d["recall_vs_exact"]), bool(d["recall_ok"]))
        except (OSError, ValueError, KeyError, TypeError):
            pass  # absent/corrupt sidecar: recompute below
    if cached_row is None:
        exact = exact_fn()
        hit = exact.join(approx, keys, "left_semi")
        row = (
            exact.agg(F.count(F.lit(1)).alias("__n_exact"))
            .crossJoin(hit.agg(F.count(F.lit(1)).alias("__n_hit")))
            .select(
                F.round(
                    F.when(F.col("__n_exact") == 0, F.lit(1.0)).otherwise(
                        F.col("__n_hit") / F.col("__n_exact")
                    ),
                    4,
                ).alias("recall_vs_exact")
            )
            .withColumn("recall_ok", F.col("recall_vs_exact") >= F.lit(floor))
            .collect()[0]
        )
        cached_row = (row["recall_vs_exact"], row["recall_ok"])
        tmp = f"{cache}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "recall_vs_exact": float(cached_row[0]),
                    "recall_ok": bool(cached_row[1]),
                    "fingerprint": fp,
                },
                f,
            )
        os.replace(tmp, cache)  # atomic: a concurrent reader never sees half
    _RECALL_MEMO[key] = (fp, cached_row)
    strict = os.environ.get("BDP_STRICT_RECALL", "1").lower() not in (
        "0",
        "false",
        "no",
    )
    if not bool(cached_row[1]) and strict:
        raise RuntimeError(
            f"{qname}: recall_vs_exact={cached_row[0]} is below the "
            f"floor {floor} (strict recall is on by default; set "
            "BDP_STRICT_RECALL=0 for flag-only)"
        )
    # the summary is a driver-side scalar by now — attach as literals
    # (zero plan cost; a broadcast crossJoin here measured ~0.4 s/query)
    return result.withColumn(
        "recall_vs_exact", F.lit(float(cached_row[0])).cast("double")
    ).withColumn("recall_ok", F.lit(bool(cached_row[1])))


def q_embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 via random-hyperplane LSH + exact re-rank
    (Spark-only: rows-only driver check; tests measure recall vs brute).
    Served from the PERSISTED multi-table signature index
    (operators/lsh_index): built once per corpus fingerprint, queries
    signed driver-side, only the probed tbl=/sig= bucket partitions
    read, one Arrow matmul kernel — the ivf serve-path discipline for
    the LSH leg. Identical ids to the in-memory ann_lsh_topk (same
    hyperplanes → same buckets → same re-rank; pinned by
    tests/test_lsh_index.py). Output carries recall_vs_exact against the
    brute-force top-k of the same 10 queries (one extra corpus scan)."""
    import hashlib
    import tempfile

    from ..operators.lsh_index import lsh_topk

    e = load_table(spark, sf_dir, "embeddings")
    key = hashlib.sha1(f"{os.path.abspath(sf_dir)}|p4|t12".encode()).hexdigest()[:16]
    index_path = os.path.join(tempfile.gettempdir(), f"bdp_lsh_{key}")
    q = e.where(F.col("vec_id") < 10)
    ann = lsh_topk(q, e, k=3, index_path=index_path)
    return _with_recall(
        spark, sf_dir, "embeddings", "embed_ann_lsh", "k3|q10",
        ann, ann.select("query_id", "neighbor_id"),
        lambda: S.cosine_topk_brute(q, e, k=3).select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"], floor=0.5)


def q_embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 via IVF coarse quantizer (deterministic sampled
    k-means cells, nprobe probing, exact re-rank). The index is persisted
    per (sf_dir, params) and built only IF missing or stale — ivf_topk
    fingerprints the corpus input files (names+size+mtime), so testdata
    regenerated at the same path forces a rebuild instead of serving a
    stale index; repeat calls over unchanged data serve from the
    cell-partitioned parquet with no retrain (build-once/query-many).
    Spark-only: rows-only check; recall vs brute tested in
    tests/test_operators.py."""
    import hashlib
    import tempfile

    from ..operators.ivf import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    key = hashlib.sha1(f"{os.path.abspath(sf_dir)}|k16|probe4|it2".encode()).hexdigest()[:16]
    index_path = os.path.join(tempfile.gettempdir(), f"bdp_ivf_{key}")
    q = e.where(F.col("vec_id") < 10)
    ivf = ivf_topk(
        q, e, k=3, n_centroids=16, nprobe=4, iterations=2,
        index_path=index_path,
    )
    return _with_recall(
        spark, sf_dir, "embeddings", "embed_ann_ivf", "k3|q10|c16|p4",
        ivf, ivf.select("query_id", "neighbor_id"),
        lambda: S.cosine_topk_brute(q, e, k=3).select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"], floor=0.4)


def _exact_jaccard_pairs(sample: DataFrame, threshold: float) -> DataFrame:
    """Exact pairwise shingle-Jaccard ≥ threshold over a SMALL doc sample —
    the bounded truth set for the recall column (all-pairs is fine on ≤~40
    docs; never run on the corpus)."""
    sh = D.shingle_table(sample)
    l = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    r = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .where(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b"))
            >= threshold
        )
        .select("id_a", "id_b")
    )


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs verified by exact shingle Jaccard
    (Spark-only: banding order is engine-specific; tests verify against a
    direct pairwise Jaccard at sf0.001). Output carries recall_vs_exact
    measured on the doc_id<40 subsample (exact all-pairs truth there)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(d, threshold=0.5)
    approx = pairs.where((F.col("id_a") < 40) & (F.col("id_b") < 40)).select("id_a", "id_b")
    return _with_recall(
        spark, sf_dir, "documents", "minhash_near_dups", "t0.5|s40",
        pairs, approx,
        lambda: _exact_jaccard_pairs(d.where(F.col("doc_id") < 40), threshold=0.5),
        ["id_a", "id_b"], floor=0.5)


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3 on 64-bit signatures,
    prefix-blocked). Spark-only. Output carries recall_vs_exact on the
    doc_id<40 subsample: exact truth = all-pairs hamming over the same
    signatures WITHOUT the prefix block (recall isolates what blocking
    loses, which is the operator's only approximation)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_near_dups(d)

    def exact_fn():
        sample = D._materialize(D.with_simhash(d.where(F.col("doc_id") < 40)))
        l = sample.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
        r = sample.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
        return (
            l.join(r, F.col("id_a") < F.col("id_b"))
            .where(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
            .select("id_a", "id_b")
        )

    approx = pairs.where((F.col("id_a") < 40) & (F.col("id_b") < 40)).select("id_a", "id_b")
    return _with_recall(
        spark, sf_dir, "documents", "simhash_near_dups", "h3|s40",
        pairs, approx, exact_fn, ["id_a", "id_b"], floor=0.5)


def q_ngram_jaccard_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for a fixed probe set of doc pairs
    (doc_id < 20 × doc_id < 20) — oracle-checkable pairwise similarity."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    sh = d.select(F.col("doc_id").alias("id"), D.shingles("text", 3).alias("sh"))
    l = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    r = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
    )


def q_doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash fingerprints: docs sharing a min-k
    shingle-hash set are near-exact dups — clusters with >1 doc.
    Fingerprints come from the Arrow kernel (bit-identical to the Column
    form; tokenization stays JVM) — the HOF chain was the most expensive
    map expression in the catalog (r12 measurement)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", T.winnow_fingerprint_batch()(T.tokens("text")).alias("fp")
        )
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("n_docs") > 1)
    )


def q_embed_near_dups_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact O(n²) baseline (oracle-checked;
    the LSH variant is the scale path)."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.cosine_near_dup_pairs_brute(e, threshold=0.4)


def q_embed_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via RP-LSH buckets + exact verify
    (Spark-only: approximate recall; tests measure it vs brute). Output
    carries recall_vs_exact on the vec_id<100 subsample (exact brute pairs
    there — bounded all-pairs, never corpus-wide)."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = S.cosine_near_dup_pairs_lsh(e, threshold=0.4)
    approx = pairs.where((F.col("id_a") < 100) & (F.col("id_b") < 100)).select("id_a", "id_b")
    return _with_recall(
        spark, sf_dir, "embeddings", "embed_near_dups_lsh", "t0.4|s100",
        pairs, approx,
        lambda: S.cosine_near_dup_pairs_brute(
            e.where(F.col("vec_id") < 100), threshold=0.4
        ).select("id_a", "id_b"),
        ["id_a", "id_b"], floor=0.5)


_SW = {lang: ", ".join(f"'{w}'" for w in ws) for lang, ws in STOPWORDS.items()}

QUERIES = {
    "doc_winnow_fingerprint": q_doc_winnow_fingerprint,
    "embed_near_dups_brute": q_embed_near_dups_brute,
    "embed_near_dups_lsh": q_embed_near_dups_lsh,
    "doc_token_stats": q_doc_token_stats,
    "doc_quality": q_doc_quality,
    "doc_lang_id": q_doc_lang_id,
    "doc_exact_dups": q_doc_exact_dups,
    "embed_knn_brute": q_embed_knn_brute,
    "embed_ann_lsh": q_embed_ann_lsh,
    "embed_ann_ivf": q_embed_ann_ivf,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "ngram_jaccard_sample": q_ngram_jaccard_sample,
}


ORACLE = {
    "doc_winnow_fingerprint": r"""
        WITH d AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
                   FROM documents),
        sh AS (
            SELECT doc_id,
                   array_to_string(
                       (list_sort(list_distinct(list_transform(
                           range(1, greatest(len(tk) - 2, 1) + 1),
                           i -> md5(array_to_string(tk[i:i+2], ' '))))))[1:4],
                       '|') AS fp
            FROM d)
        SELECT fp, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
        FROM sh GROUP BY fp HAVING count(*) > 1
    """,
    "embed_near_dups_brute": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 4) AS sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4
    """,
    "doc_token_stats": r"""
        WITH t AS (
            SELECT lang, source,
                   len(regexp_split_to_array(trim(lower(text)), '\s+'))::BIGINT AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS bpe_tokens
            FROM documents)
        SELECT lang, source, count(*) AS n_docs,
               sum(n_tokens)::BIGINT AS total_tokens,
               round(avg(n_tokens), 4) AS avg_tokens,
               max(n_tokens) AS max_tokens,
               sum(bpe_tokens)::BIGINT AS total_bpe_tokens,
               round(avg(bpe_tokens::DOUBLE / n_tokens), 4) AS bpe_per_word
        FROM t GROUP BY lang, source
    """,
    "doc_quality": r"""
        WITH t AS (
            SELECT lang,
                   len(regexp_split_to_array(trim(lower(text)), '\s+'))::BIGINT AS n_tokens,
                   length(text)::BIGINT AS n_chars,
                   (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
                       / length(text) AS pr
            FROM documents),
        s AS (
            SELECT lang, pr,
                   ((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END)
                    + (CASE WHEN pr < 0.1 THEN 1.0 ELSE 0.0 END)
                    + (CASE WHEN n_chars::DOUBLE / n_tokens >= 2.0
                            AND n_chars::DOUBLE / n_tokens <= 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0 AS q
            FROM t)
        SELECT lang, count(*) AS n_docs,
               round(avg(pr), 4) AS avg_punct_ratio,
               round(avg(q), 4) AS avg_quality,
               round(min(q), 4) AS min_quality
        FROM s GROUP BY lang
    """,
    "doc_lang_id": rf"""
        WITH toks AS (
            SELECT lang, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
            FROM documents),
        scores AS (
            SELECT lang,
                   len(list_filter(tk, t -> list_contains([{_SW['en']}], t)))::BIGINT AS s_en,
                   len(list_filter(tk, t -> list_contains([{_SW['de']}], t)))::BIGINT AS s_de,
                   len(list_filter(tk, t -> list_contains([{_SW['es']}], t)))::BIGINT AS s_es,
                   len(list_filter(tk, t -> list_contains([{_SW['fr']}], t)))::BIGINT AS s_fr
            FROM toks)
        SELECT lang,
               CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                    WHEN s_es >= s_fr THEN 'es'
                    ELSE 'fr' END AS lang_guess,
               count(*) AS n
        FROM scores GROUP BY 1, 2
    """,
    "doc_exact_dups": """
        WITH fps AS (
            SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents)
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY fp) AS keeper_doc_id,
               (count(*) OVER (PARTITION BY fp))::BIGINT AS cluster_size,
               doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
        FROM fps
    """,
    "embed_knn_brute": """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 10),
             c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
             scored AS (
                SELECT query_id, neighbor_id,
                       round(list_cosine_similarity(qv, cv), 4) AS sim
                FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
             ranked AS (
                SELECT query_id, neighbor_id, sim,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rk
                FROM scored)
        SELECT query_id, neighbor_id, sim, rk::BIGINT AS rk FROM ranked WHERE rk <= 3
    """,
    "ngram_jaccard_sample": r"""
        WITH d AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
                   FROM documents WHERE doc_id < 20),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(tk) - 2, 1) + 1),
                       i -> array_to_string(tk[i:i+2], ' '))) AS s
            FROM d)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    """,
    # embed_ann_lsh / minhash_near_dups / simhash_near_dups: intentionally no
    # oracle (LSH banding internals aren't SQL-expressible at parity);
    # rows-only driver check + recall tests in tests/.
}
