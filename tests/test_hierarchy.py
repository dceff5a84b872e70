"""Hierarchical / recursive query surface (operators/graph.py:
hierarchy_levels, transitive_closure) — the WITH RECURSIVE workload as a
level-synchronous frontier loop with scale controls (per-level shuffles,
lineage checkpoints, cycle termination). Cross-checked three ways: hand-
built forests, DuckDB WITH RECURSIVE over a derived 150-node customer
tree, and Spark 4's own recursive-CTE executor on the same tree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

from binance_data_pipeline_spark.catalog import load_table
from binance_data_pipeline_spark.operators.graph import (
    hierarchy_levels,
    transitive_closure,
)
from oracle_harness import duck_connection


def test_hierarchy_levels_forest(spark):
    """Two roots (explicit NULL parent and never-a-child), exact depths
    and root attribution."""
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("d", "b"), ("x", None), ("y", "x")],
        "child string, parent string",
    )
    got = {
        r["node"]: (r["depth"], r["root"])
        for r in hierarchy_levels(edges, max_depth=10).collect()
    }
    assert got == {
        "a": (0, "a"), "b": (1, "a"), "c": (1, "a"), "d": (2, "a"),
        "x": (0, "x"), "y": (1, "x"),
    }


def test_hierarchy_cycle_raises(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("r", None)], "child string, parent string"
    )
    with pytest.raises(ValueError, match="cycle"):
        hierarchy_levels(edges, max_depth=10)


def _customer_tree(spark):
    """Derived binary tree over the customer table: node k's parent is
    k div 2 (root 0) — contiguous keys make every parent exist."""
    c = load_table(spark, SF_SMALL, "customer")
    return c.where(F.col("c_custkey") >= 1).select(
        F.col("c_custkey").alias("child"),
        F.expr("c_custkey div 2").alias("parent"),
    )


def test_hierarchy_matches_duckdb_recursive_cte(spark):
    got = {
        (r["node"], r["depth"])
        for r in hierarchy_levels(_customer_tree(spark), max_depth=16).collect()
    }
    duck = duck_connection(SF_SMALL)
    try:
        oracle = duck.sql("""
            WITH RECURSIVE tree AS (
                SELECT 0::BIGINT AS node, 0 AS depth
                UNION ALL
                SELECT c.c_custkey, t.depth + 1
                FROM customer c JOIN tree t ON t.node = c.c_custkey // 2
                WHERE c.c_custkey >= 1
            ) SELECT node, depth FROM tree
        """).fetchall()
    finally:
        duck.close()
    assert got == {(n, d) for n, d in oracle}
    assert len(got) == 150  # every customer assigned


def test_hierarchy_matches_spark_recursive_cte(spark):
    """Spark 4's own WITH RECURSIVE executor agrees with the frontier
    loop on the same tree — pins that the iterative form is a faithful
    (and scale-controlled) lowering of the SQL surface."""
    load_table(spark, SF_SMALL, "customer").createOrReplaceTempView("cust_rcte")
    cte = spark.sql("""
        WITH RECURSIVE tree AS (
            SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
            UNION ALL
            SELECT c.c_custkey, t.depth + 1
            FROM cust_rcte c JOIN tree t ON t.node = c.c_custkey div 2
            WHERE c.c_custkey >= 1
        ) SELECT node, depth FROM tree
    """)
    got_cte = {(r["node"], r["depth"]) for r in cte.collect()}
    got_loop = {
        (r["node"], r["depth"])
        for r in hierarchy_levels(_customer_tree(spark), max_depth=16).collect()
    }
    assert got_cte == got_loop


def test_transitive_closure_minimal_hops_and_cycle_termination(spark):
    """Reachability with a cycle (a->b->c->a) plus a branch: terminates,
    hops are minimal, unreachable nodes absent."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("z", "q")],
        "src string, dst string",
    )
    roots = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["hops"] for r in transitive_closure(edges, roots=roots).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 2}
    with pytest.raises(ValueError, match="roots explicitly"):
        transitive_closure(edges, roots=None)


def test_hierarchy_exact_max_depth_ok(spark):
    """A forest whose deepest node sits EXACTLY at max_depth must
    succeed — the exhausted loop probes the final frontier for children
    before declaring a cycle (ADVICE r7: off-by-one)."""
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c")], "child string, parent string"
    )  # chain a->b->c->d, depth 3
    got = {
        r["node"]: r["depth"] for r in hierarchy_levels(edges, max_depth=3).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    # one LESS than the true depth still raises
    with pytest.raises(ValueError, match="max_depth"):
        hierarchy_levels(edges, max_depth=2)


def test_closure_exact_max_iters_ok(spark):
    """Closure whose farthest node is reached EXACTLY at max_iters
    converges (no spurious non-convergence), one fewer raises."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    roots = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["hops"]
        for r in transitive_closure(edges, roots=roots, max_iters=3).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    with pytest.raises(ValueError, match="max_iters"):
        transitive_closure(edges, roots=roots, max_iters=2)
