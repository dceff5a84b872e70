"""PageRank: parity with a pure-python power iteration on the same
semantics, conservation of rank mass with dangling nodes, structural
sanity (hub ranks highest), and validation."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest

from binance_data_pipeline_spark.operators.graph import pagerank


def _ref_pagerank(edges, d=0.85, iters=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in rank.items() if v not in out)
        inflow = {v: 0.0 for v in nodes}
        for u, v in edges:
            inflow[v] += rank[u] / out[u]
        rank = {
            v: (1 - d) / n + d * (inflow[v] + dangling / n) for v in nodes
        }
    return rank


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),              # d links in, nothing links to d
    ("c", "e"),              # e is dangling (no out-edges)
]


def test_matches_pure_python_power_iteration(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=10).collect()}
    ref = _ref_pagerank(EDGES, iters=10)
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-9, (v, got[v], ref[v])


def test_rank_mass_conserved_with_dangling(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    total = sum(r["rank"] for r in pagerank(e, iterations=7).collect())
    assert abs(total - 1.0) < 1e-9


def test_hub_ranks_highest(spark):
    # star pointing at 'hub' + a cycle keeping mass flowing back out
    edges = [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")]
    e = spark.createDataFrame(edges, "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iterations=15).collect()}
    assert ranks["hub"] == max(ranks.values())


def test_checkpointing_does_not_change_results(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    a = {r["node"]: r["rank"] for r in pagerank(e, iterations=6, checkpoint_every=2).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(e, iterations=6, checkpoint_every=100).collect()}
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_validation(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=0)
