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


def test_weighted_edges_shift_rank(spark):
    """An explicit weight column reroutes mass: with a 9:1 weighting of
    a's out-edges, b outranks c; unweighted (parallel-edge multiplicity)
    reproduces the same result as duplicate rows."""
    weighted = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(weighted, weight_col="w", iterations=12).collect()
    }
    assert ranks["b"] > ranks["c"]
    # duplicate-row multiplicity ≡ integer weights
    dup_rows = [("a", "b")] * 9 + [("a", "c"), ("b", "a"), ("c", "a")]
    dup = spark.createDataFrame(dup_rows, "src string, dst string")
    ranks_dup = {r["node"]: r["rank"] for r in pagerank(dup, iterations=12).collect()}
    for v in ranks:
        assert abs(ranks[v] - ranks_dup[v]) < 1e-12


def test_tolerance_early_stop_matches_converged_result(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    full = {r["node"]: r["rank"] for r in pagerank(e, iterations=60).collect()}
    early = {
        r["node"]: r["rank"]
        for r in pagerank(e, iterations=60, tol=1e-10).collect()
    }
    for v in full:
        assert abs(full[v] - early[v]) < 1e-8
