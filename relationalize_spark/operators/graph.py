"""Iterative graph analytics over edge-list DataFrames.

Complements the hash-min connected components in
``operators/dedup.py:dedup_clusters`` (the dedup-pipeline step) with
the other classic fixed-point computation: PageRank. On a curation
pipeline the shape shows up as influence/centrality over bipartite
interaction graphs (user <-> item, customer <-> supplier, doc <->
domain) for weighting and sampling decisions.

Scale shape per iteration: one equi-join of the edge list with the
current rank vector (both keyed by node — the join reuses one
partitioning across iterations) plus one shuffle aggregation on the
destination key. Edge and rank frames only ever carry (id, number)
rows; nothing is collected to the driver. The rank frame is
checkpointed locally every few iterations so the lineage (and the
Catalyst plan) stays bounded.

Determinism across engines: float summation order differs between
any two engines (and between two Spark runs with different
partitioning), so each iteration's rank is quantized to
``quantize`` decimals after damping — drift from reordering is
~1e-16 relative, absorbed by the quantum, and the next iteration
starts from bit-identical inputs everywhere. The same trick the
repo's weighted sampler uses for its hash draws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    damping: float = 0.85,
    max_iter: int = 5,
    quantize: int = 12,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(id, rank)`` for every node appearing as a source or
    destination. Classic simplified treatment of dangling nodes
    (out-degree 0): their mass leaks each iteration rather than being
    redistributed — for a leak-free result feed a graph where every
    node has an out-edge (e.g. add reverse edges for bipartite
    interaction graphs, which also makes the walk ergodic).

    ``max_iter`` is deliberately a fixed count, not a convergence
    test: the result is a pure function of (edges, parameters), which
    is what makes the chained-CTE SQL oracle replayable.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg__"))
    # (src, dst, deg) is static across iterations; persist once.
    link = e.join(deg, "src").persist()

    base = (1.0 - damping) / n_nodes
    try:
        ranks = nodes.select(
            "id", F.lit(round(1.0 / n_nodes, quantize)).alias("rank")
        )
        for i in range(max_iter):
            contribs = (
                link.join(ranks.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("rank") / F.col("__deg__")).alias("__in__"))
            )
            ranks = nodes.join(contribs, "id", "left").select(
                "id",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce("__in__", F.lit(0.0)),
                    quantize,
                ).alias("rank"),
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < max_iter:
                # Bound lineage/plan growth across iterations.
                ranks = ranks.localCheckpoint(eager=False)
        # Materialize the result BEFORE dropping the cached inputs its
        # lazy plan depends on (mirrors kmeans_fit's finally-unpersist).
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        nodes.unpersist()
        link.unpersist()
    return ranks
