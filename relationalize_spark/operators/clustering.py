"""K-means clustering over embedding columns, Spark-first.

Lloyd's algorithm with both halves of each iteration expressed as
DataFrame operations:

- **Assignment** is a pure projection: the k current centroids are
  inlined into the plan as array literals, squared distances come
  from ``zip_with``/``aggregate`` (whole-stage codegen, no Python),
  and argmin is ``array_position(dists, array_min(dists))``. No
  join, no shuffle — it fuses into the scan.
- **Update** is ``posexplode(vec) -> groupBy(cluster, dim) ->
  sum/count``: map-side partial aggregation collapses every
  partition to at most ``k * dim`` rows before the single shuffle,
  so the reduction traffic is independent of the row count.

Driver-side state per iteration is the tiny ``k x dim`` centroid
matrix (same pattern as IVF training in
:mod:`relationalize_spark.operators.similarity`). At 100 TB the
per-iteration cost is one scan + one ``k*dim``-row shuffle, which
is the floor for exact Lloyd's.

The reference engine has no clustering; this belongs to the
large-scale training-data toolkit beside dedup/similarity/sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double
from ..plans.scale import ensure_parallelism


def _lit_vec(c: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in c])


def _dist2(v: Column, centroid: list[float]) -> Column:
    """Squared L2 distance from ``v`` to a literal centroid."""
    return F.aggregate(
        F.zip_with(v, _lit_vec(centroid), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment as a scan-fused projection.

    Ties break to the lowest cluster index (``array_position``
    returns the first minimum), so assignment is deterministic.
    """
    v = as_double(vec_col)
    dists = F.array(*[_dist2(v, c) for c in centroids])
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn(out_col, cluster)


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 10,
    max_iter: int = 10,
    id_col: str | None = None,
    tol: float = 1e-9,
) -> list[list[float]]:
    """Fit k centroids with Lloyd's iterations; returns the k x dim
    centroid matrix.

    Initialization is deterministic: the vectors of the ``k``
    smallest ``id_col`` values (or the first k rows if no id is
    given). Empty clusters keep their previous centroid. Stops early
    when the max squared centroid shift drops below ``tol``.
    """
    init_df = df.orderBy(id_col).limit(k) if id_col else df.limit(k)
    centroids = [
        list(r.v) for r in init_df.select(as_double(vec_col).alias("v")).collect()
    ]
    if len(centroids) < k:
        raise ValueError(f"need at least k={k} rows, got {len(centroids)}")
    dim = len(centroids[0])

    base = ensure_parallelism(df.select(as_double(vec_col).alias("v"))).persist()
    try:
        for _ in range(max_iter):
            stats = (
                assign_clusters(base, centroids, "v", "cluster")
                .select("cluster", F.posexplode("v").alias("dim", "x"))
                .groupBy("cluster", "dim")
                .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            new = [list(c) for c in centroids]
            for r in stats:
                new[r.cluster][r.dim] = r.s / r.n
            shift = max(
                sum((a - b) * (a - b) for a, b in zip(oc, nc))
                for oc, nc in zip(centroids, new)
            )
            centroids = new
            if shift < tol:
                break
    finally:
        base.unpersist()
    return centroids


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 10,
    max_iter: int = 10,
    id_col: str | None = None,
    out_col: str = "cluster",
) -> DataFrame:
    """Fit + assign: ``df`` with an ``out_col`` cluster id column."""
    centroids = kmeans_fit(df, vec_col, k, max_iter, id_col)
    return assign_clusters(df, centroids, vec_col, out_col)
