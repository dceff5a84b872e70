"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path alongside the RP-LSH variant (similarity.py).

Build: deterministic k-means over the corpus — seeds are the k lowest-id
vectors (reproducible, no RNG), refined by a few Lloyd iterations executed
as DataFrame jobs (assign = broadcast-centroid argmin via min_by; update =
per-dimension mean via posexplode + groupBy). Centroids land on the driver
(k × dim floats — tiny) and are re-broadcast as literals.

Query: probe the `nprobe` nearest centroid cells per query, exact cosine
re-rank within the probed cells. Candidates ∝ nprobe/k of the corpus —
the classic recall/cost dial.

At 100 TB: the assignment pass is one broadcast-join scan; cell lists are
just a `cell_id` column (partition or Z-order by it for locality); Lloyd
iterations run on a sample rather than the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _spread, cosine


def _centroid_array_col(centroids: list[tuple[int, list[float]]]) -> Column:
    """Centroids as a literal array<struct<cid,vec>> column."""
    return F.array(
        *[
            F.struct(F.lit(cid).alias("cid"), F.array(*[F.lit(x) for x in vec]).alias("vec"))
            for cid, vec in centroids
        ]
    )


def _assign(df: DataFrame, id_col: str, vec_col: str, centroids) -> DataFrame:
    """(id, vec, cell_id): nearest centroid by cosine, via min_by over an
    exploded centroid literal — one scan, no shuffle."""
    cents = _centroid_array_col(centroids)
    exploded = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.explode(cents).alias("c")
    )
    scored = exploded.select(
        "id", "v", F.col("c.cid").alias("cid"), cosine(F.col("v"), F.col("c.vec")).alias("sim")
    )
    return scored.groupBy("id").agg(
        F.max_by("cid", "sim").alias("cell_id"), F.first("v").alias("v")
    )


def train_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 2,
) -> list[tuple[int, list[float]]]:
    """Deterministic k-means: seed with the k lowest-id vectors, refine
    with Lloyd iterations (per-dimension mean via posexplode)."""
    seeds = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).alias("v"))
        .collect()
    )
    centroids = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seeds)]
    base = _spread(corpus).select(F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col))
    for _ in range(iterations):
        assigned = _assign(base, id_col, vec_col, centroids)
        dim_means = (
            assigned.select("cell_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in dim_means:
            by_cell.setdefault(r["cell_id"], {})[r["pos"]] = r["m"]
        new = []
        for cid, old in centroids:
            if cid in by_cell:
                dims = by_cell[cid]
                new.append((cid, [dims[i] for i in range(len(old))]))
            else:
                new.append((cid, old))  # empty cell keeps its centroid
        centroids = new
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """IVF ANN top-k: train coarse centroids, assign corpus to cells, probe
    the nprobe nearest cells per query, exact cosine re-rank inside them."""
    centroids = train_centroids(corpus, id_col, vec_col, n_centroids, iterations)
    corpus_cells = _assign(
        _spread(corpus), id_col, vec_col, centroids
    ).select(F.col("id").alias("neighbor_id"), F.col("cell_id"), F.col("v").alias("cv"))
    corpus_cells = corpus_cells.localCheckpoint(eager=True)

    # query → nprobe nearest cells
    cents = _centroid_array_col(centroids)
    q_exploded = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), F.explode(cents).alias("c")
    ).select(
        "query_id", "qv", F.col("c.cid").alias("cell_id"), cosine(F.col("qv"), F.col("c.vec")).alias("csim")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cell_id"))
    q_cells = (
        q_exploded.withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= nprobe)
        .select("query_id", "qv", "cell_id")
    )

    scored = (
        q_cells.join(corpus_cells, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )
