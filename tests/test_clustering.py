"""Topic discovery: clusters separate planted topics, keywords are the
topic-characteristic terms, determinism holds, and the plans carry no
row-Python/Cartesian smells."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from binance_data_pipeline_spark.operators.clustering import (
    cluster_corpus,
    cluster_keywords,
    discover_topics,
)
from binance_data_pipeline_spark.plans.audit import audit_plan

# two unmistakable topics, 6 docs each
SOLAR = [
    "solar panels convert sunlight photons into electricity efficiently",
    "photovoltaic solar cells generate renewable electricity from sunlight",
    "rooftop solar panels harvest sunlight for household electricity",
    "solar inverters turn panel electricity into usable household power",
    "sunlight intensity drives solar panel electricity output curves",
    "solar farms aggregate panel electricity for the regional grid",
]
CASTLE = [
    "medieval castles defended towns with moats and stone walls",
    "knights garrisoned medieval castles behind thick stone walls",
    "castle sieges breached stone walls with medieval trebuchets",
    "medieval stone walls surrounded the castle keep and bailey",
    "the medieval castle drawbridge crossed the moat to stone walls",
    "medieval masons raised castle walls from quarried stone blocks",
]


def _docs(spark):
    rows = [(f"s{i}", t) for i, t in enumerate(SOLAR)]
    rows += [(f"c{i}", t) for i, t in enumerate(CASTLE)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_clusters_separate_planted_topics_and_are_deterministic(spark):
    docs = _docs(spark)
    a1 = {r["doc_id"]: r["cluster_id"]
          for r in cluster_corpus(docs, k=2, embed_dim=256).collect()}
    a2 = {r["doc_id"]: r["cluster_id"]
          for r in cluster_corpus(docs.repartition(5), k=2, embed_dim=256).collect()}
    assert a1 == a2  # deterministic under repartitioning
    solar = {a1[f"s{i}"] for i in range(6)}
    castle = {a1[f"c{i}"] for i in range(6)}
    assert len(solar) == 1 and len(castle) == 1 and solar != castle


def test_keywords_are_topic_characteristic(spark):
    docs = _docs(spark)
    assignments, kw = discover_topics(docs, k=2, embed_dim=256, top_terms=5)
    a = {r["doc_id"]: r["cluster_id"] for r in assignments.collect()}
    by_cluster: dict[int, list[str]] = {}
    for r in kw.collect():
        by_cluster.setdefault(r["cluster_id"], []).append(r["term"])
    solar_terms = set(by_cluster[a["s0"]])
    castle_terms = set(by_cluster[a["c0"]])
    assert {"solar", "electricity"} & solar_terms
    assert {"castle", "stone", "medieval"} & castle_terms
    # c-TF-IDF damps shared vocabulary: no term tops both clusters
    assert not (solar_terms & castle_terms)
    # every cluster got exactly top_terms rows, ranked 1..n
    for terms in by_cluster.values():
        assert len(terms) == 5


def test_cluster_existing_embedding_column(spark):
    from binance_data_pipeline_spark.operators.embedder import embed_texts

    docs = embed_texts(_docs(spark), dim=256)
    a = {r["doc_id"]: r["cluster_id"]
         for r in cluster_corpus(docs, vec_col="embedding", k=2).collect()}
    assert {a[f"s{i}"] for i in range(6)} != {a[f"c{i}"] for i in range(6)}


def test_plans_are_scale_clean(spark):
    docs = _docs(spark)
    assignments = cluster_corpus(docs, k=2, embed_dim=64)
    kw = cluster_keywords(docs, assignments, top_terms=3)
    for df in (assignments, kw):
        findings = [
            f for f in audit_plan(df) if f.code in ("PY_ROW_EVAL", "CARTESIAN")
        ]
        assert findings == [], findings


def test_cli_topics(spark, tmp_path, capsys):
    from binance_data_pipeline_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    _docs(spark).write.parquet(src)
    out = str(tmp_path / "topics")
    assert main(["topics", "--docs", src, "--out", out,
                 "--k", "2", "--embed-dim", "256", "--top-terms", "4"]) == 0
    assert "docs=12 clusters=2" in capsys.readouterr().out
    kw = spark.read.parquet(out + "/keywords.parquet")
    assert kw.count() == 8  # 2 clusters × 4 terms
