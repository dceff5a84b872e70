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

__all__ = ["pagerank"]


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
