"""Link-graph centrality — PageRank over an edge list (Page et al.,
1999; the Spark formulation is the canonical iterative-join example,
e.g. the PageRank program in the original Spark/RDD paper, here in
DataFrame form). In a crawl pipeline, domain- or page-level centrality
is a standard quality prior (seed lists, crawl frontiers, and quality
weighting all consume it) — it complements the content-based scorers
(quality_rules / lm_score / quality_classifier) with a signal content
can't fake.

Semantics (the standard ones):

    rank(v) = (1 − d)/N + d · ( Σ_{u→v} rank(u)/outdeg(u) + dangling/N )

with dangling mass (nodes with no out-edges) redistributed uniformly —
so ranks sum to 1 every iteration, a property the tests pin.

Plan per iteration: one join (ranks × edges on src — ranks is
node-keyed, the join is the unavoidable shuffle of distributed
PageRank) + one groupBy(dst) sum with map-side partial agg + one scalar
dangling aggregate. Lineage is truncated every few iterations
(localCheckpoint) so 20 iterations don't build a 40-stage plan. No
Python anywhere; no driver state beyond the scalar dangling mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "hierarchy_levels", "transitive_closure"]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 5,
    weight_col: str | None = None,
    tol: float | None = None,
) -> DataFrame:
    """(node, rank) after up to ``iterations`` power steps. Duplicate
    edges count as parallel links (weight = multiplicity); pass
    ``weight_col`` for explicit edge weights (contribution ∝ weight /
    weighted out-degree; weights must be ≥ 0). Self-loops are legal.
    Node set = every id appearing as src OR dst.

    ``tol``: optional early stop — iteration ends when the L1 delta
    Σ|rank − prev| drops below it (one extra scalar aggregate per
    iteration; None = fixed iteration count, no extra pass)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    wexpr = (
        F.col(weight_col).cast("double") if weight_col is not None else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), wexpr.alias("wt")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.sum("wt").alias("deg"))
    # (node, deg) with deg NULL for dangling nodes; checkpointed once —
    # every iteration reuses the same materialized edge/degree tables.
    # Zero-weight-only sources count as dangling (no mass can leave).
    ranked_edges = e.join(deg, "src").where(F.col("deg") > 0).localCheckpoint(eager=True)
    node_deg = nodes.join(
        deg.select(F.col("src").alias("node"), "deg"), "node", "left"
    ).localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        with_deg = ranks.join(node_deg.select("node", "deg"), "node")
        dangling = (
            with_deg.where(
                F.col("deg").isNull() | (F.col("deg") <= 0)
            ).agg(F.sum("rank")).first()[0]
            or 0.0
        )
        contribs = (
            ranked_edges.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("wt") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        if tol is not None:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            delta = (
                new_ranks.join(
                    ranks.select("node", F.col("rank").alias("__prev")), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
            if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
                ranks = ranks.localCheckpoint(eager=True)
    return ranks


def hierarchy_levels(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_depth: int = 64,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Depth + root of every node in a parent-child forest — the
    hierarchical query (org charts, category trees, reply threads) SQL
    expresses as WITH RECURSIVE. Spark 4 runs recursive CTEs, but an
    unbounded rCTE is the wrong tool on a 100 TB cluster: the recursion
    is driver-planned with no per-step lineage truncation or convergence
    short-circuit. This is the same computation as an explicit frontier
    loop — level-synchronous BFS from the roots — with the scale
    controls the iterative form allows: one equi-join shuffle per LEVEL
    (not per row), lineage checkpointed every few levels, early exit the
    moment a frontier is empty.

    Roots = nodes whose parent is NULL or never appears as a child. A
    cycle (or depth beyond ``max_depth``) leaves its nodes UNASSIGNED and
    raises — silent truncation would mislabel depths.

    Returns (node, depth, root): depth 0 at roots.
    """
    e = edges.select(
        F.col(child_col).alias("child"), F.col(parent_col).alias("parent")
    ).where(F.col(child_col).isNotNull())
    children = e.select("child").distinct()
    all_nodes = children.unionByName(
        e.where(F.col("parent").isNotNull()).select(F.col("parent").alias("child"))
    ).distinct()
    roots = all_nodes.join(
        e.where(F.col("parent").isNotNull()).select("child").distinct(),
        "child",
        "left_anti",
    ).select(
        F.col("child").alias("node"),
        F.lit(0).alias("depth"),
        F.col("child").alias("root"),
    )

    assigned = roots
    frontier = roots
    for depth in range(1, max_depth + 1):
        nxt = (
            e.join(
                frontier.select(F.col("node").alias("parent"), "root"),
                "parent",
            )
            .select(
                F.col("child").alias("node"),
                F.lit(depth).alias("depth"),
                "root",
            )
        )
        if nxt.isEmpty():
            break
        assigned = assigned.unionByName(nxt)
        frontier = nxt
        if depth % checkpoint_every == 0:
            assigned = assigned.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    else:
        # the loop exhausted with a non-empty frontier at exactly
        # max_depth — that is only an error if those nodes still have
        # children (one more isEmpty probe, no extra level assigned)
        deeper = e.join(
            frontier.select(F.col("node").alias("parent")), "parent"
        )
        if not deeper.isEmpty():
            raise ValueError(
                f"hierarchy deeper than max_depth={max_depth} (cycle?)"
            )

    missing = all_nodes.join(assigned.select(F.col("node").alias("child")), "child", "left_anti")
    n_missing = missing.count()
    if n_missing:
        sample = [r["child"] for r in missing.limit(5).collect()]
        raise ValueError(
            f"{n_missing} node(s) unreachable from any root (cycle), e.g. {sample}"
        )
    return assigned


def transitive_closure(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    roots: DataFrame | None = None,
    max_iters: int = 64,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Nodes reachable from ``roots`` (or from every node's own id when
    None — then returns (src, dst) reachable PAIRS only for the rooted
    form; pass roots explicitly for the scalable variant). Frontier BFS
    with a visited set — terminates on cycles (unlike a naive UNION ALL
    recursive CTE, which loops forever on a cycle; the UNION-distinct
    form terminates but re-shuffles the whole accumulated set every
    step, where this loop only dedups the new frontier against visited).

    Returns (node, hops): minimum hop count from any root.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if roots is None:
        raise ValueError(
            "pass roots explicitly — all-pairs closure is O(V·E) and is "
            "never the right shape at scale; compute per root set instead"
        )
    visited = roots.select(F.col(roots.columns[0]).alias("node")).distinct().select(
        "node", F.lit(0).alias("hops")
    )
    frontier = visited
    for hop in range(1, max_iters + 1):
        nxt = (
            e.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("hops"))
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
        if hop % checkpoint_every == 0:
            visited = visited.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    else:
        # exhausting the loop with a non-empty frontier only means
        # non-convergence if that frontier can still reach UNVISITED
        # nodes — a frontier whose successors are all visited is done
        leftover = (
            e.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .join(visited.select("node"), "node", "left_anti")
        )
        if not leftover.isEmpty():
            raise ValueError(
                f"closure did not converge within max_iters={max_iters}"
            )
    return visited
