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
partitioning), so ranks live on a ``10^-quantize`` BIGINT lattice
end to end (r10 — the q143 floor-lattice discipline; the previous
round-after-float-sum form absorbed reorder drift only while no
value sat on a round boundary, and any flip would AMPLIFY through
the remaining iterations): each edge's contribution is
``floor(rank_q / deg)`` (exact, order-free BIGINT sum), the damped
update is one IEEE multiply floored back onto the lattice, and the
final rank is one exact division. Every step is bit-identical in
any engine and under any partitioning.
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

    import math

    q_den = 10**quantize
    # both constants computed with the exact IEEE op order the SQL
    # oracle uses: (1 - d) / n, then * 10^q; 1.0 / n, then * 10^q
    base_q = math.floor(((1.0 - damping) / n_nodes) * q_den)
    try:
        ranks = nodes.select(
            "id",
            F.lit(math.floor((1.0 / n_nodes) * q_den))
            .cast("long")
            .alias("rank_q"),
        )
        for i in range(max_iter):
            # floor(rank_q / deg) per edge: exact BIGINTs, so the
            # per-destination sum is order-free integer arithmetic
            contribs = (
                link.join(ranks.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(
                    F.sum(
                        F.floor(F.col("rank_q") / F.col("__deg__"))
                    ).alias("__in__")
                )
            )
            ranks = nodes.join(contribs, "id", "left").select(
                "id",
                (
                    F.lit(base_q)
                    + F.floor(
                        F.lit(damping)
                        * F.coalesce("__in__", F.lit(0).cast("long"))
                    )
                )
                .cast("long")
                .alias("rank_q"),
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < max_iter:
                # Bound lineage/plan growth across iterations.
                ranks = ranks.localCheckpoint(eager=False)
        ranks = ranks.select(
            "id",
            (F.col("rank_q").cast("double") / F.lit(float(q_den))).alias(
                "rank"
            ),
        )
        # Materialize the result BEFORE dropping the cached inputs its
        # lazy plan depends on (mirrors kmeans_fit's finally-unpersist).
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        nodes.unpersist()
        link.unpersist()
    return ranks
