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
``rank_q div deg`` (true integer division — exact quanta and an
order-free BIGINT sum; r11 ADVICE replaced the earlier
floor-of-IEEE-quotient, whose per-edge term was only
deterministic-IEEE, not exact), the damped
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
    from decimal import Decimal

    if quantize > 15:
        # rank_q approaches 10^quantize; damping * sum must stay an
        # EXACT double (< 2^53 ~ 9e15) or the floor is no longer
        # bit-replayable — the whole point of the lattice
        raise ValueError(
            f"quantize={quantize} puts rank quanta past 2^53; the "
            "damped update would lose exactness (max 15)"
        )
    q_den = 10**quantize
    # (1 - damping) computed in DECIMAL, not IEEE: SQL engines parse
    # `1 - 0.85` as exact decimal 0.15, while python 1.0 - 0.85 is
    # 0.15000000000000002 — one ulp apart, and the floored base
    # quantum then differs by 1 for whole families of n_nodes (r10
    # review, reproduced for n in {3, 6, 12, 24, ...}). Decimal
    # mirrors the engines; the remaining ops (double divide by n,
    # multiply by 10^q, floor) are IEEE-identical on both sides.
    one_minus_d = float(Decimal(1) - Decimal(str(damping)))
    base_q = math.floor((one_minus_d / n_nodes) * q_den)
    try:
        ranks = nodes.select(
            "id",
            F.lit(math.floor((1.0 / n_nodes) * q_den))
            .cast("long")
            .alias("rank_q"),
        )
        for i in range(max_iter):
            # rank_q div deg per edge: TRUE integer division (not
            # floor of an IEEE quotient — `/` on two BIGINTs divides
            # as doubles, whose floor can land one off the exact
            # quotient near integer boundaries; r11 ADVICE), so the
            # per-edge quanta are exact and the per-destination sum
            # is order-free integer arithmetic. The oracle mirrors
            # with DuckDB's `//`; both operands are nonnegative so
            # truncating and flooring division agree.
            contribs = (
                link.join(ranks.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(
                    F.sum(
                        F.expr("rank_q div __deg__")
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
