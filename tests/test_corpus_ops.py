"""Corpus-composition operators: PII redaction, document chunking,
deterministic sampling/mixing/shuffling."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from binance_data_pipeline_spark.operators.sampling import (
    hash_sample,
    mix_corpora,
    shuffle_deterministic,
    stratified_sample,
)
from binance_data_pipeline_spark.operators.text import (
    chunk_documents,
    redact_documents,
)


# ------------------------------------------------------------ redaction

def test_redact_pii_types_and_counts(spark):
    rows = [
        (1, "contact alice@example.com or visit https://example.com/x?q=1 now"),
        (2, "server at 192.168.1.10 answered; call 555-123-4567 after lunch"),
        (3, "mail bob.smith+tag@sub.domain.org and carol@x.io today"),
        (4, "perfectly clean prose with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_documents(df).collect()}

    assert "<EMAIL>" in out[1]["text"] and "<URL>" in out[1]["text"]
    assert "alice@example.com" not in out[1]["text"]
    assert out[1]["pii"]["email"] == 1 and out[1]["pii"]["url"] == 1
    assert "<IP>" in out[2]["text"] and "<PHONE>" in out[2]["text"]
    assert out[2]["pii"]["ip"] == 1 and out[2]["pii"]["phone"] == 1
    assert out[3]["pii"]["email"] == 2
    assert out[4]["text"] == rows[3][1]  # untouched
    assert all(v == 0 for v in out[4]["pii"].asDict().values())

    # shielding order: the dotted quad must not double-count as phone
    assert out[2]["pii"]["phone"] == 1


# ------------------------------------------------------------- chunking

def test_chunk_documents_windows_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    chunks = chunk_documents(df, chunk_tokens=4, overlap_tokens=1).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk_text"], r["n_tokens"]))
    c1 = sorted(by_doc[1])
    # step = 3, starts at tokens 1,4,7 (1-based); last window clamped
    assert [c[1] for c in c1] == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
    ]
    assert all(c[2] == 4 for c in c1)
    # short doc: exactly one chunk, all tokens
    assert by_doc[2] == [(0, "short doc", 2)]

    # overlap reconstruction: dropping the first overlap_tokens of every
    # chunk after the first re-yields the original token stream
    toks = c1[0][1].split()
    for _, t, _ in c1[1:]:
        toks += t.split()[1:]
    assert toks == text.split()

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


# ------------------------------------------------------------- sampling

def test_hash_sample_deterministic_and_calibrated(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3, seed=7).collect()}
    b = {r["doc_id"] for r in hash_sample(df.repartition(13), "doc_id", 0.3, seed=7).collect()}
    assert a == b  # partitioning-independent
    assert abs(len(a) / 20_000 - 0.3) < 0.02
    c = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3, seed=8).collect()}
    assert a != c  # seed changes the draw
    # nested rates: a higher-rate draw at the same seed contains the lower
    d = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.5, seed=7).collect()}
    assert a <= d


def test_stratified_sample_rates(spark):
    df = spark.range(30_000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")), (F.col("id") % 3 + 1).cast("int")).alias("lang"),
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.5, "de": 0.1}).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    assert abs(got["en"] / 10_000 - 0.5) < 0.03
    assert abs(got["de"] / 10_000 - 0.1) < 0.03
    assert "fr" not in got  # default_rate 0


def test_mix_corpora_weights_and_upsampling(spark):
    web = spark.range(10_000).withColumnRenamed("id", "doc_id").withColumn("src", F.lit("w"))
    code = spark.range(4_000).withColumnRenamed("id", "doc_id").withColumn("src", F.lit("c"))
    mixed = mix_corpora({"web": (web, 0.5), "code": (code, 2.5)}, "doc_id")
    counts = {r["mix_source"]: r["count"] for r in mixed.groupBy("mix_source").count().collect()}
    assert abs(counts["web"] / 10_000 - 0.5) < 0.03
    # rate 2.5: two full epochs + ~half a third
    assert abs(counts["code"] / 4_000 - 2.5) < 0.1
    # repeats are distinguishable for downstream shuffling
    epochs = {r["mix_epoch"] for r in mixed.where(F.col("mix_source") == "code").select("mix_epoch").distinct().collect()}
    assert epochs == {0, 1, 2}


def test_shuffle_deterministic_reproducible_permutation(spark):
    df = spark.range(5_000).withColumnRenamed("id", "doc_id")
    s1 = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", seed=3, num_partitions=8).collect()]
    s2 = [r["doc_id"] for r in shuffle_deterministic(df.repartition(17), "doc_id", seed=3, num_partitions=8).collect()]
    assert s1 == s2                      # same permutation, any input layout
    assert sorted(s1) == list(range(5_000))  # it IS a permutation
    s3 = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", seed=4, num_partitions=8).collect()]
    assert s1 != s3                      # seed gives an independent order


def test_corpus_ops_are_map_only(spark):
    """Redaction, chunking, and sampling must plan ZERO exchanges — they
    are the map-side stages of the corpus pipeline; a shuffle here would
    be pure waste at 100 TB (shuffle_deterministic's single range
    exchange is the deliberate exception)."""
    df = spark.createDataFrame(
        [(1, "some text with words", "en")], "doc_id long, text string, lang string"
    )
    for name, out in [
        ("redact", redact_documents(df)),
        ("chunk", chunk_documents(df, chunk_tokens=8, overlap_tokens=2)),
        ("sample", stratified_sample(df, "doc_id", "lang", {"en": 0.5})),
        ("hash_sample", hash_sample(df, "doc_id", 0.5)),
    ]:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (name, plan)


def test_pack_sequences_budget_and_determinism(spark):
    from binance_data_pipeline_spark.operators.sampling import pack_sequences

    rows = [(i, 40 + (i * 37) % 200) for i in range(2_000)]  # sizes 40..239
    rows.append((9_999, 5_000))                              # oversize chunk
    df = spark.createDataFrame(rows, "chunk_id long, n_tokens long")

    packs = pack_sequences(df, "chunk_id", "n_tokens", budget=512, num_groups=8).collect()
    normal = [p for p in packs if not p["oversize"]]
    over = [p for p in packs if p["oversize"]]

    # hard invariant: no non-oversize pack exceeds the budget
    assert all(p["total_tokens"] <= 512 for p in normal)
    assert [list(p["members"]) for p in over] == [[9_999]]

    # every chunk lands in exactly one pack
    packed = [m for p in packs for m in p["members"]]
    assert sorted(packed) == sorted(r[0] for r in rows)

    # FFD utilization: mean fill of non-final packs should be high
    total_tokens = sum(n for _, n in rows[:-1])
    min_possible = -(-total_tokens // 512)
    assert len(normal) <= int(min_possible * 1.15)  # within 15% of the lower bound

    # deterministic under repartitioning
    again = pack_sequences(df.repartition(17), "chunk_id", "n_tokens", budget=512, num_groups=8).collect()
    key = lambda p: (p["pack_id"], list(p["members"]), p["total_tokens"])
    assert sorted(map(key, packs)) == sorted(map(key, again))

    with pytest.raises(ValueError):
        pack_sequences(df, "chunk_id", "n_tokens", budget=0)


def test_contamination_report_finds_planted_probe(spark):
    from binance_data_pipeline_spark.operators.dedup import contamination_report

    probe_text = (
        "what is the capital of france answer paris is the capital and "
        "largest city of france situated on the seine river"
    )
    filler = (
        "training data about parquet row groups and shuffle exchanges in "
        "distributed columnar engines with adaptive query execution plans "
        "spanning many executor nodes and partitioned joins"
    )
    corpus = spark.createDataFrame(
        [
            (1, filler),
            (2, "intro text " + probe_text + " plus trailing commentary"),  # full inclusion
            (3, filler.replace("parquet", "orc")),
            (4, "partial leak what is the capital of france answer paris then diverges completely "
                "into unrelated material about database indexes and storage"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([(100, probe_text)], "doc_id long, text string")

    hits = {r["doc_id"]: r for r in contamination_report(corpus, probes, n=8).collect()}
    assert 2 in hits and hits[2]["overlap"] == 1.0       # verbatim inclusion
    assert 4 in hits and 0 < hits[4]["overlap"] < 1.0    # partial leak
    assert 1 not in hits and 3 not in hits               # clean docs

    # raising the floor drops the partial leak
    strict = {r["doc_id"] for r in
              contamination_report(corpus, probes, n=8, min_overlap=0.9).collect()}
    assert strict == {2}


def test_contamination_bloom_matches_exact_scan(spark):
    """The Bloom-prefiltered scan returns BYTE-IDENTICAL results to
    contamination_report (false positives die at the exact verify), the
    prefilter genuinely removes most non-matching corpus shingles, and
    the plan stays UDF-free with the probe side un-broadcast."""
    import numpy as np

    from binance_data_pipeline_spark.operators.dedup import (
        contamination_report,
        contamination_report_bloom,
        shingle_table,
    )

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(400)]
    mk = lambda k: " ".join(rng.choice(vocab, size=60))
    probe_text = " ".join(rng.choice(vocab, size=40))
    corpus = spark.createDataFrame(
        [(i, mk(i)) for i in range(40)]
        + [(100, "prefix " + probe_text + " suffix"), (101, mk(101))],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(500, probe_text), (501, " ".join(rng.choice(vocab, size=35)))],
        "doc_id long, text string",
    )

    want = sorted(
        map(tuple, contamination_report(corpus, probes, n=8).collect())
    )
    got_df = contamination_report_bloom(corpus, probes, n=8)
    assert sorted(map(tuple, got_df.collect())) == want and len(want) >= 1

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan

    # prefilter effectiveness: corpus shingles surviving the bloom are a
    # small fraction (true matches + ~0.3% fp of ~2400 distinct shingles)
    c_sh = shingle_table(corpus, "doc_id", "text", 8).select(
        F.col("id").alias("c_id"), F.explode("sh").alias("g")
    )
    total = c_sh.count()
    p_sh = shingle_table(probes, "doc_id", "text", 8).select(F.explode("sh").alias("g"))
    survivors = c_sh.join(p_sh.distinct(), "g", "left_semi").count()
    # bloom-passed set ≈ survivors (+fp); bound it well under the corpus
    assert survivors < total * 0.1


def test_repetition_ratio_scores(spark):
    from binance_data_pipeline_spark.operators.text import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "buy now " * 50),                                 # degenerate loop
            (2, " ".join(f"w{i}" for i in range(100))),           # all-distinct prose
            (3, "too short"),                                     # < n tokens
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["rep"] for r in
           df.select("doc_id", repetition_ratio("text").alias("rep")).collect()}
    assert got[1] > 0.9
    assert got[2] == 0.0
    assert got[3] == 0.0
    # map-only
    plan = df.select(repetition_ratio("text"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_paragraphs_strips_boilerplate_keeps_order(spark):
    from binance_data_pipeline_spark.operators.dedup import dedup_paragraphs

    footer = "subscribe to our newsletter for updates"
    docs = [
        (1, "unique intro one\n\n" + footer + "\n\nunique body one"),
        (2, "unique intro two\n\n" + footer + "\n\nunique body two"),
        (3, "unique intro three\n\n" + footer),
        (4, footer),                       # nothing but boilerplate
        (5, "standalone doc with no shared paragraphs at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_paragraphs(df, max_occurrences=1).collect()}

    assert out[1]["text"] == "unique intro one\n\nunique body one"  # order kept
    assert out[1]["n_paras"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["text"] == "unique intro two\n\nunique body two"
    assert out[3]["text"] == "unique intro three"
    assert out[4]["text"] == "" and out[4]["n_removed"] == 1        # all boilerplate
    assert out[5]["text"] == docs[4][1] and out[5]["n_removed"] == 0

    # a paragraph repeated within ONE doc is not cross-doc boilerplate
    solo = spark.createDataFrame(
        [(9, "alpha\n\nalpha\n\nbeta")], "doc_id long, text string"
    )
    r = dedup_paragraphs(solo, max_occurrences=1).first()
    assert r["text"] == "alpha\n\nalpha\n\nbeta" and r["n_removed"] == 0


# ----------------------------------------------------------------------
# leakage-safe corpus split
# ----------------------------------------------------------------------

def test_split_corpus_calibration_and_determinism(spark):
    from binance_data_pipeline_spark.operators.sampling import split_corpus

    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    out = split_corpus(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
    shares = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(shares) == {"train", "val", "test"}
    assert abs(shares["train"] / 20000 - 0.8) < 0.02
    assert abs(shares["val"] / 20000 - 0.1) < 0.01
    # same seed → identical assignment under different partitioning
    again = split_corpus(df.repartition(17), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
    diff = out.join(again.withColumnRenamed("split", "s2"), "doc_id").where(F.col("split") != F.col("s2"))
    assert diff.count() == 0


def test_split_corpus_group_coherent(spark):
    from binance_data_pipeline_spark.operators.sampling import split_corpus

    # 1000 docs in 100 dedup clusters: no cluster may straddle splits
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100).alias("cluster")
    )
    out = split_corpus(df, "doc_id", {"train": 0.7, "test": 0.3}, group_col="cluster")
    straddlers = (
        out.groupBy("cluster").agg(F.countDistinct("split").alias("k")).where(F.col("k") > 1)
    )
    assert straddlers.count() == 0


def test_split_corpus_is_map_only(spark):
    from binance_data_pipeline_spark.operators.sampling import split_corpus

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    out = split_corpus(df, "doc_id", {"train": 0.9, "test": 0.1})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_corpus_validates_fractions(spark):
    from binance_data_pipeline_spark.operators.sampling import split_corpus

    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(df, "doc_id", {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError, match="at least one"):
        split_corpus(df, "doc_id", {})


def test_sample_token_budget_meets_budgets(spark):
    """Per-domain token budgets met within a few percent, whole-domain
    passthrough for unlisted/over-budgeted domains, deterministic draw."""
    import numpy as np

    from binance_data_pipeline_spark.operators.sampling import sample_token_budget

    rng = np.random.default_rng(4)
    rows = []
    did = 0
    for dom, n, mean in (("web", 4000, 120), ("code", 2000, 400), ("books", 300, 2000)):
        for _ in range(n):
            k = max(1, int(rng.lognormal(np.log(mean), 0.6)))
            rows.append((did, dom, "tok " * k))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    totals = {
        r["domain"]: r["t"]
        for r in docs.groupBy("domain").agg(F.sum(tok).alias("t")).collect()
    }

    budgets = {"web": 150_000, "code": 200_000, "books": 10_000_000}  # books over-budget
    sampled, report = sample_token_budget(
        docs, "doc_id", "domain", budgets, refine_iters=2, tolerance=0.01
    )
    got = {
        r["domain"]: r["t"]
        for r in sampled.groupBy("domain").agg(F.sum(tok).alias("t")).collect()
    }
    assert abs(got["web"] - 150_000) / 150_000 < 0.05
    assert abs(got["code"] - 200_000) / 200_000 < 0.05
    assert got["books"] == totals["books"]          # budget ≥ total: whole domain
    assert report["books"]["rate"] == 1.0
    assert 0 < report["web"]["rate"] < 1

    # determinism: same seed → identical row set, any partitioning
    again, _ = sample_token_budget(
        docs.repartition(13), "doc_id", "domain", budgets, refine_iters=2, tolerance=0.01
    )
    assert sorted(r["doc_id"] for r in sampled.select("doc_id").collect()) == \
           sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_sample_token_budget_unlisted_domain_passthrough(spark):
    from binance_data_pipeline_spark.operators.sampling import sample_token_budget

    docs = spark.createDataFrame(
        [(1, "a", "x " * 50), (2, "b", "y " * 50)],
        "doc_id long, domain string, text string",
    )
    sampled, report = sample_token_budget(docs, "doc_id", "domain", {"a": 10})
    kept = {r["doc_id"] for r in sampled.collect()}
    assert 2 in kept            # domain b unlisted: untouched
    assert set(report) == {"a"}


def test_sample_token_budget_final_filter_is_map_side(spark):
    """The selection itself is one map-side filter (the threshold search
    pays small aggs, the output plan carries no extra exchange)."""
    from binance_data_pipeline_spark.operators.sampling import sample_token_budget

    docs = spark.createDataFrame(
        [(i, "a", "t " * 100) for i in range(500)],
        "doc_id long, domain string, text string",
    )
    sampled, _ = sample_token_budget(docs, "doc_id", "domain", {"a": 5_000})
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cap_per_group_exact_and_approx_paths(spark):
    """Per-domain cap: small over-cap domains cut EXACTLY at the cap,
    giant domains cut approximately via hash threshold, under-cap domains
    untouched — all deterministic under repartitioning."""
    from binance_data_pipeline_spark.operators.sampling import cap_per_group

    rows = (
        [(i, "small-over") for i in range(500)]
        + [(1000 + i, "under") for i in range(50)]
        + [(10_000 + i, "giant") for i in range(30_000)]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    capped = cap_per_group(
        df, "doc_id", "domain", max_rows=100, exact_threshold=1000
    )
    got = {
        r["domain"]: r["n"]
        for r in capped.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got["small-over"] == 100            # exact path
    assert got["under"] == 50                  # passthrough
    assert abs(got["giant"] - 100) <= 40       # hash-rate path, ~±1/sqrt(cap)

    again = cap_per_group(
        df.repartition(17), "doc_id", "domain", max_rows=100, exact_threshold=1000
    )
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_cap_per_group_counts_stay_in_plan(spark):
    """Scale contract: over-cap groups enter the plan as a broadcast-
    joined counts frame, NOT driver literals — the plan shows a
    BroadcastHashJoin and no isin/keys list over group values, and a
    non-string (long) group column joins on its real type."""
    from binance_data_pipeline_spark.operators.sampling import cap_per_group

    # high-cardinality long group col: 200 groups over cap, 800 under
    rows = [(g * 100_000 + i, g) for g in range(1000) for i in range(12 if g < 200 else 3)]
    df = spark.createDataFrame(rows, "doc_id long, host_id long")
    capped = cap_per_group(df, "doc_id", "host_id", max_rows=5, exact_threshold=10**6)

    got = {
        r["host_id"]: r["n"]
        for r in capped.groupBy("host_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n == 5 for g, n in got.items() if g < 200)
    assert all(n == 3 for g, n in got.items() if g >= 200)

    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no group value may appear as a plan literal (isin list / create_map)
    assert " IN (" not in plan
    for probe in ("100000, 200000", "create_map", "keys: ["):
        assert probe not in plan


def test_cap_per_group_no_overcap_is_noop(spark):
    from binance_data_pipeline_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, domain string")
    out = cap_per_group(df, "doc_id", "domain", max_rows=10)
    assert out is df  # literally untouched: no joins, no plan growth
