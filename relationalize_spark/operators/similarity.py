"""Similarity search over embedding columns.

Two paths:

- **Brute-force cosine top-k** — exact. The query set is broadcast,
  the corpus streams through one scan, per-query heaps come from a
  partial top-k before the final window. Right answer whenever the
  query set is small enough to broadcast (the common batch-ANN shape:
  thousands of queries x billions of corpus rows).
- **Random-hyperplane LSH top-k** — approximate. Deterministic seeded
  hyperplanes, bucket join on the signature prefix, exact re-rank
  inside buckets. The scale path when the query set itself is huge:
  turns O(Q x N) into a bucket-colocated join.

Vector math is Catalyst higher-order functions (see
functions/vectors.py) — no Python UDF, Arrow, or collect in the loop.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, dot
from ..plans.scale import ensure_parallelism
from ..functions.lattice import floor_lattice


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int | None = 6,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Returns (query_id, neighbor_id, score), scores latticed for stable
    cross-engine comparison; ranking ties break on neighbor id.

    Shape: the query matrix (bounded by the same small-enough-to-
    broadcast contract the join formulation had) rides into every
    scan task; each Arrow batch scores against ALL queries with one
    float64 matmul and keeps its local top-k, so only Q*k candidate
    rows per partition reach the final window — the corpus is
    streamed once and never joined, shuffled, or materialized
    per-pair. Per-pair Catalyst lambda evaluation (the previous
    formulation) costs ~100x more per row interpreted.
    """
    import numpy as np

    q_rows = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).collect()
    q_ids = np.array([r.query_id for r in q_rows])
    q_mat = np.stack([np.asarray(r.qv, dtype=np.float64) for r in q_rows])
    q_norm = np.linalg.norm(q_mat, axis=1)

    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
    )
    kk = k

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            nid = pdf["neighbor_id"].to_numpy()
            scores = (q_mat @ cm.T) / (
                q_norm[:, None] * np.linalg.norm(cm, axis=1)[None, :]
            )  # (Q, B)
            scores[q_ids[:, None] == nid[None, :]] = -np.inf  # self-pairs
            top = min(kk, scores.shape[1])
            kth = -np.partition(-scores, top - 1, axis=1)[:, top - 1]
            # keep everything within one final-lattice quantum of the
            # local k-th, so a row that FLOORS equal to it can still
            # win its id tiebreak in the global window
            margin = 10.0 ** -round_scores if round_scores is not None else 0.0
            qi, ci = np.nonzero(scores >= (kth - margin)[:, None])
            out = pd.DataFrame(
                {
                    "query_id": q_ids[qi],
                    "neighbor_id": nid[ci],
                    "score": scores[qi, ci],
                }
            )
            yield out[np.isfinite(out["score"])]

    scored = c.mapInPandas(
        local_topk, schema="query_id long, neighbor_id long, score double"
    )
    score = F.col("score")
    if round_scores is not None:
        score = floor_lattice(score, round_scores)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def knn_label_eval(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-quality evaluation by k-NN label agreement: for each
    query vector, do its ``k`` exact nearest neighbors (cosine,
    self excluded) vote its own label back? High agreement means the
    embedding space clusters the labels — the standard cheap probe of
    an embedding column before spending on it (curation by embedding,
    SemDeDup, ANN retrieval all inherit its geometry).

    ``queries`` must be a BOUNDED frame (an eval sample — defaults to
    the whole corpus, only sensible for small ones): neighbors come
    from :func:`brute_force_topk`, which streams the corpus once per
    Arrow batch against the collected query matrix, so the corpus
    side scales but the query side rides in memory.

    Majority vote with deterministic tiebreaks: count desc, then
    label asc — replayable in any SQL engine (no float order enters
    the vote). Returns
    ``(query_id, true_label, pred_label, match)``.
    """
    q = queries if queries is not None else corpus
    topk = brute_force_topk(corpus, q, k=k, id_col=id_col, vec_col=vec_col)
    neigh_labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__nl__")
    )
    votes = (
        topk.join(neigh_labels, "neighbor_id")
        .groupBy("query_id", "__nl__")
        .agg(F.count("*").alias("__n__"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__n__"), F.asc("__nl__")
    )
    pred = (
        votes.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select("query_id", F.col("__nl__").alias("pred_label"))
    )
    truth = q.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
    )
    return pred.join(truth, "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        (F.col("true_label") == F.col("pred_label")).alias("match"),
    )


def vector_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding dimension from the first row (the testdata has
    shipped schema changes between driver regenerations; inferring
    beats a stale hardcoded constant)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row.d is None or row.d <= 0:
        raise ValueError(f"cannot infer vector dim from column {vec_col!r}")
    return int(row.d)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def signature_expr(vec, planes: list[list[float]]):
    """Bit-signature of a vector: sign pattern against each hyperplane,
    packed into a long. Pure Catalyst — fine for a FEW planes; for
    whole LSH table banks use :func:`plane_signatures`, which runs the
    n_tables x n_planes dot products as one numpy matmul per Arrow
    batch instead of interpreted per-element lambdas (measured ~50x
    on 48x3 planes x 64 dims)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, plane_col) > 0, 1).otherwise(0).cast("long")
        sig = sig + F.shiftleft(bit, i)
    return sig


def plane_signatures(n_tables: int, n_planes: int, dim: int, seed: int):
    """Vectorized signature bank: a pandas_udf mapping a vector column
    to the ``array<long>`` of its ``n_tables`` bucket signatures
    (bit i of table t = sign of plane (t, i); identical bit layout to
    :func:`signature_expr` over ``_hyperplanes(dim, n_planes,
    seed + 1000*t)``).

    Why a UDF when the repo convention is Catalyst-first: the bank is
    a dense (n_tables*n_planes, dim) matrix, and Catalyst higher-order
    lambdas evaluate interpreted per element — 9k+ multiply-adds per
    row dwarf the Arrow transfer they avoid. One float64 matmul per
    batch is the 100 TB-right shape; the planes ride into the workers
    as a ~100 KB closure, no shuffle."""
    import numpy as np

    bank = np.concatenate(
        [
            np.asarray(_hyperplanes(dim, n_planes, seed + 1000 * t))
            for t in range(n_tables)
        ]
    )  # (n_tables*n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def sigs(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (x @ bank.T > 0).astype(np.int64)  # (n, T*P)
        packed = bits.reshape(len(x), n_tables, n_planes) @ weights
        return pd.Series(list(packed))

    return sigs


def _kmeans_centroids(
    sample: list[list[float]], n_clusters: int, iters: int = 8, seed: int = 42
) -> list[list[float]]:
    """Tiny driver-side k-means on a bounded sample (deterministic)."""
    import numpy as np

    x = np.asarray(sample, dtype="float64")
    rng = np.random.RandomState(seed)
    centroids = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids.tolist()


def _ivf_train(
    corpus: DataFrame,
    vec_col: str,
    n_clusters: int,
    sample_size: int,
    seed: int,
    distributed_train_threshold: int,
) -> list[list[float]]:
    """Corpus-representative IVF centroid training, routed on size.

    Up to ``distributed_train_threshold`` rows: a seeded UNIFORM
    random sample of ~``sample_size`` vectors is collected whole (no
    ``limit()`` cut — a limit reads only the first partitions, and on
    a cluster-sorted corpus a prefix sample collapses the centroids
    onto one region, breaking IVF's O(N*probe/clusters) candidate
    bound; ``tests/test_pipeline_ops.py::test_ivf_train_balance``
    pins the failure mode) and clustered on the driver.

    Above the threshold: distributed Lloyd's
    (:func:`clustering.kmeans_fit`) over a seeded sample capped at
    ``64 * sample_size`` rows — executor-side scan-fused assignment,
    k*dim-row shuffles per iteration, nothing corpus-sized ever
    reaches the driver."""
    n_corpus = corpus.count()
    if n_corpus > distributed_train_threshold:
        from .clustering import kmeans_fit

        cap = 64 * sample_size
        frac = min(1.0, cap / n_corpus)
        train = corpus.sample(fraction=frac, seed=seed) if frac < 1.0 else corpus
        return kmeans_fit(train, vec_col, k=n_clusters, max_iter=8)
    frac = min(1.0, float(sample_size) / max(n_corpus, 1))
    sampled = corpus.sample(fraction=frac, seed=seed) if frac < 1.0 else corpus
    sample = [
        [float(x) for x in r[0]] for r in sampled.select(vec_col).collect()
    ]
    return _kmeans_centroids(sample, n_clusters, seed=seed)


def _nearest_clusters_udf(centroids: list[list[float]], n: int):
    """pandas_udf: vector column -> array<int> of the n cluster ids
    with highest dot product, ties by cluster id ascending (stable
    argsort reproduces the struct-sort tiebreak of the previous
    Catalyst formulation). One matmul per Arrow batch — the same
    vectorization as :func:`plane_signatures`, replacing k*dim
    interpreted literal-array dots per row."""
    import numpy as np

    cm = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def nearest(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        order = np.argsort(-(x @ cm.T), axis=1, kind="stable")[:, :n]
        return pd.Series(list(order.astype("int32")))

    return nearest


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
    round_scores: int | None = 6,
    distributed_train_threshold: int = 262_144,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means centroids are
    trained on a corpus-representative basis (see below); every corpus
    vector lands in one cluster (its argmax-dot centroid), queries
    probe their ``n_probe`` nearest clusters, and candidates re-rank
    exactly. The cluster assignment is a pure Catalyst projection, the
    candidate join is an equi-join on cluster id — O(N * probe/clusters)
    scored pairs instead of O(Q x N).

    Centroid training routes on corpus size — driver k-means over a
    seeded uniform sample below ``distributed_train_threshold``,
    distributed Lloyd's above it; see :func:`_ivf_train` (the one
    count it spends is amortized into the one-time index build).

    Recall contract: >= 0.9 top-k recall on clustered corpora (pinned
    by test_ivf_recall_on_clustered_data). On isotropic/uniform
    vectors recall drops (~0.76 measured at these defaults) because
    centroid cells carve arbitrary boundaries through a structureless
    cloud — inherent to IVF; raise ``n_probe`` (every +1 adds
    ~1/n_clusters of the corpus to the candidate set) or use
    :func:`lsh_topk` for such data."""
    centroids = _ivf_train(
        corpus, vec_col, n_clusters, sample_size, seed, distributed_train_threshold
    )

    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    assign1 = _nearest_clusters_udf(centroids, 1)
    probe = _nearest_clusters_udf(centroids, n_probe)
    c_tab = c.select(
        "neighbor_id", "cv", assign1(F.col("cv"))[0].alias("cluster")
    )
    q_tab = q.select(
        "query_id", "qv", F.explode(probe(F.col("qv"))).alias("cluster")
    )
    score = cosine(F.col("qv"), F.col("cv"))
    if round_scores is not None:
        score = floor_lattice(score, round_scores)
    candidates = (
        F.broadcast(q_tab)
        .join(c_tab, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int | None = 64,
    seed: int = 42,
    round_scores: int | None = 6,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing an LSH
    bucket with the query in any of ``n_tables`` independent tables,
    re-ranked exactly by cosine. Recall grows with n_tables and falls
    with n_planes (bucket granularity). ``dim=None`` infers the
    dimension from the first query vector (one 1-row action) — pass
    it explicitly in hot paths."""
    if dim is None:
        dim = vector_dim(queries, vec_col)
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    sigs = plane_signatures(n_tables, n_planes, dim, seed)
    c_tab = c.select(
        "neighbor_id", "cv", F.posexplode(sigs("cv")).alias("tbl", "bucket")
    )
    q_tab = q.select(
        "query_id", "qv", F.posexplode(sigs("qv")).alias("tbl", "bucket")
    )
    score = cosine(F.col("qv"), F.col("cv"))
    if round_scores is not None:
        score = floor_lattice(score, round_scores)
    candidates = (
        F.broadcast(q_tab)
        .join(
            c_tab,
            (q_tab.tbl == c_tab.tbl) & (q_tab.bucket == c_tab.bucket),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, qvec array<tinyint>, qscale double): symmetric per-vector
    int8 quantization — the corpus representation you PERSIST at
    100 TB. int8 cuts the at-rest and scan footprint 4x vs float32
    (16x vs the double intermediates), which is usually the
    difference between an ANN corpus fitting executor memory or
    spilling. Dequantize with functions.vectors.int8_dequantize."""
    from ..functions.vectors import int8_quantize, int8_scale

    v = as_double(vec_col)
    base = df.select(F.col(id_col).alias("id"), v.alias("v"))
    scaled = base.select("id", "v", int8_scale(F.col("v")).alias("qscale"))
    return scaled.select(
        "id",
        int8_quantize(F.col("v"), F.col("qscale")).alias("qvec"),
        "qscale",
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int | None = 6,
) -> DataFrame:
    """Asymmetric quantized search: exact float queries scored
    against the int8-dequantized corpus (the standard
    query-stays-float scheme — query precision is free, corpus
    precision is what costs storage/IO). Same contract as
    brute_force_topk; scores carry the quantization error, so treat
    results as approximate and rescore survivors in float where
    exactness matters."""
    from ..functions.vectors import int8_dequantize

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = ensure_parallelism(quantize_embeddings(corpus, id_col, vec_col)).select(
        F.col("id").alias("neighbor_id"),
        int8_dequantize(F.col("qvec"), F.col("qscale")).alias("cv"),
    )
    score = cosine(F.col("qv"), F.col("cv"))
    if round_scores is not None:
        score = floor_lattice(score, round_scores)
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


# -- Product quantization (PQ) + asymmetric-distance (ADC) search ----------

def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jegou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"): the vector
    space splits into ``m`` contiguous subspaces and each gets its own
    k-means codebook. Returns ``m`` codebooks of ``k x (dim/m)``
    centroids.

    Runs every subspace fit in REPLAYABLE mode
    (clustering.kmeans_fit: integer-lattice centroid sums, floored
    assignment scores, lowest-id init), so the entire training —
    and everything downstream of it (encode, ADC distances) — is an
    engine-replayable pure function of (data, parameters): that is
    what gives q137 a full chained-CTE value oracle for a
    quantized-ANN pipeline.

    Scale shape: m independent Lloyd's fits, each one scan +
    ``k x dim/m``-row shuffle per iteration over the SLICED vectors
    (never the full width); driver state is the m codebooks.

    The m fits are INDEPENDENT, so (r11, guide §2.6 "overlap
    independent jobs") they are submitted from a driver thread pool —
    each fit's own jobs stay sequential (data-dependent), but
    subspace j+1's iteration tasks back-fill executors idled by
    subspace j's collect tail. Each fit's math, inputs and iteration
    count are untouched, so the codebooks are bit-identical to the
    sequential ones (q137/q142 oracles pin this). The init collect is
    also shared: ONE id-ordered prefix collect of the full vectors,
    sliced per subspace on the driver — slicing commutes with the
    row selection, so each sliced init equals the sub-frame's own
    ``orderBy(id).limit(k)`` init (m jobs -> 1)."""
    from concurrent.futures import ThreadPoolExecutor

    from .clustering import kmeans_fit

    dim = vector_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    init_rows = [
        list(r.v)
        for r in df.orderBy(id_col)
        .limit(k)
        .select(as_double(vec_col).alias("v"))
        .collect()
    ]

    def fit(j: int) -> list[list[float]]:
        sub = df.select(
            F.col(id_col),
            F.slice(as_double(vec_col), j * d + 1, d).alias("__sub__"),
        )
        return kmeans_fit(
            sub, "__sub__", k=k, max_iter=iters, id_col=id_col,
            replayable=True,
            init_centroids=[v[j * d : (j + 1) * d] for v in init_rows],
        )

    with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
        books = list(pool.map(fit, range(m)))
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector as ``m`` small codes: per subspace, the
    replayable nearest-centroid assignment over the sliced vector.
    Output: ``id_col, code_0 .. code_{m-1}`` — the dim-doubles row
    becomes m small ints (the 32x storage/IO compression that makes
    billion-vector search feasible). Pure projection per subspace
    (one Arrow-batched matmul each), no shuffle."""
    from .clustering import assign_clusters

    m = len(codebooks)
    d = len(codebooks[0][0])
    out = df.select(F.col(id_col), as_double(vec_col).alias("__v__"))
    for j in range(m):
        out = assign_clusters(
            out.withColumn("__sub__", F.slice("__v__", j * d + 1, d)),
            codebooks[j],
            "__sub__",
            f"code_{j}",
            replayable=True,
        ).drop("__sub__")
    return out.drop("__v__")


def pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: queries stay exact floats;
    each query precomputes an ``m x k`` distance table against the
    codebooks, and a corpus vector's distance is the sum of m table
    lookups on its codes — no float math touches the corpus at query
    time.

    Engine-replayable by construction: table entries are the floored
    assignment-score lattice (``floor((|c|^2/2 - q.c) * 1e9)`` as
    BIGINT, clustering.REPLAY_SCORE), so per-vector distances are
    exact integer sums — order-free, bit-identical in any engine —
    and ties break to the lowest neighbor id.

    Returns ``(query_id, neighbor_id, pq_dist)``, ``k`` rows per
    query, self-matches excluded. Plan: the 640-entry distance table
    (Q x m x k) broadcasts; corpus codes explode to m rows each, join
    the table on (subspace, code), and one (query, vector)-key sum +
    window takes the top k. Shuffle traffic is (ids, BIGINT) pairs
    bounded by corpus x Q — the query panel must be
    broadcast-small, the same contract as brute_force_topk."""
    import math

    import numpy as np

    from .clustering import REPLAY_SCORE

    spark = corpus_codes.sparkSession
    m = len(codebooks)
    d = len(codebooks[0][0])
    qrows = queries.select(
        F.col(id_col), as_double(vec_col).alias("__v__")
    ).collect()
    scale = 10.0 ** REPLAY_SCORE
    trows = []
    for r in qrows:
        qv = np.asarray(r["__v__"], dtype=np.float64)
        for j, book in enumerate(codebooks):
            cm = np.asarray(book, dtype=np.float64)  # (k, d)
            scores = 0.5 * (cm * cm).sum(axis=1) - cm @ qv[j * d : (j + 1) * d]
            for c, s in enumerate(scores):
                trows.append((r[id_col], j, c, int(math.floor(s * scale))))
    tdf = spark.createDataFrame(
        trows, "query_id long, j int, c int, t long"
    )
    code_arr = F.array(*[F.col(f"code_{j}") for j in range(m)])
    exploded = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"), F.posexplode(code_arr).alias("j", "c")
    )
    dist = (
        exploded.join(F.broadcast(tdf), ["j", "c"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("t").alias("pq_dist"))
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("pq_dist"), F.asc("neighbor_id"))
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "pq_dist")
    )


# -- IVF-PQ: coarse cells + PQ on residuals (the FAISS IVFPQ shape) ---------

def ivfpq_index(
    df: DataFrame,
    *,
    cells: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    k: int = 16,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[list[list[float]]], DataFrame]:
    """Build the IVF-PQ index (Jegou et al. 2011 §V: IVFADC): a
    coarse quantizer partitions the corpus into ``cells`` inverted
    lists, and product quantization encodes each vector's RESIDUAL
    against its cell centroid — residuals are far more concentrated
    than raw vectors, so the same code budget quantizes them with
    much less distortion, and search only touches the probed cells'
    lists. Returns ``(coarse_centroids, codebooks, codes)`` where
    ``codes`` has ``id_col, cell, code_0..code_{m-1}``.

    Every stage is the replayable lattice machinery: the coarse fit
    and assignment are clustering.py's replayable k-means, the
    residual is an elementwise IEEE double subtract against the
    constant-folded centroid map (``zip_with`` — JVM-side, no UDF),
    and the PQ codebooks train on the residual frame through the same
    replayable path — so the ENTIRE index is an engine-replayable
    pure function of (data, parameters), which is what gives q142 a
    full chained-CTE value oracle for the production
    billion-vector index shape.

    Scale: coarse fit is ``coarse_iters`` (scan + cells x dim-row
    shuffle); residuals are a pure projection; PQ adds m independent
    sliced fits. Driver state: cells x dim + m x k x dim/m doubles."""
    from .clustering import assign_clusters, kmeans_fit

    coarse = kmeans_fit(
        df, vec_col, k=cells, max_iter=coarse_iters, id_col=id_col,
        replayable=True,
    )
    base = df.select(F.col(id_col), as_double(vec_col).alias("__v__"))
    asg = assign_clusters(base, coarse, "__v__", "cell", replayable=True)
    cmap = F.create_map(
        *[
            c
            for cell, cen in enumerate(coarse)
            for c in (F.lit(cell), F.array(*[F.lit(x) for x in cen]))
        ]
    )
    res = asg.select(
        F.col(id_col),
        "cell",
        F.zip_with(
            "__v__", F.element_at(cmap, F.col("cell")), lambda a, b: a - b
        ).alias("__res__"),
    ).persist()
    # res feeds 6 consumers (4 sub-fits, encode, the cell re-attach);
    # uncached, each re-runs the coarse-assignment matmul over the
    # whole corpus. Persist for the builds, then cut lineage with an
    # eager checkpoint of the SMALL codes frame (id + m codes + cell —
    # no vectors) and release the corpus-sized cache before returning
    # (the spans.py cache-lifecycle rule: operators must not leak
    # corpus-proportional cached frames to the caller).
    try:
        books = pq_train(
            res, "__res__", m=m, k=k, iters=pq_iters, id_col=id_col
        )
        codes = pq_encode(res, books, vec_col="__res__", id_col=id_col).join(
            res.select(id_col, "cell"), id_col
        )
        codes = codes.localCheckpoint(eager=True)
    finally:
        res.unpersist()
    return coarse, books, codes


def ivfpq_topk(
    codes: DataFrame,
    queries: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    *,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe-bounded ADC search over the IVF-PQ index: each query
    picks its ``nprobe`` nearest cells (replayable floored coarse
    scores, ties to the lowest cell), computes its RESIDUAL against
    each probed centroid, and precomputes one ``m x k`` floored
    distance table per (query, probed cell). A corpus vector is
    scored only if its cell is probed — the inverted-list bound that
    makes billion-vector search tractable — and its distance is the
    exact BIGINT sum of m table lookups (order-free, engine-
    replayable; the pq_topk discipline with a per-cell table).

    Returns ``(query_id, neighbor_id, adc_dist)``, ties to the lowest
    neighbor id, self-matches excluded. The (query, cell, subspace,
    code) table is Q x nprobe x m x k rows — broadcast-small by the
    same contract as pq_topk's panel.

    Cross-cell comparability: flat PQ may drop the per-query constant
    ``|q|^2/2`` from its tables (rank-invariant), but composed IVF-PQ
    must NOT drop the analogous ``|q - c_cell|^2/2`` — it differs per
    probed cell, so candidates from two cells would be ranked on
    incomparable scales (a real defect this module shipped for one
    commit; pinned by test_ivfpq_contracts_on_clustered_data). The
    floored constant is added once per (query, cell) onto the
    subspace-0 table rows, making ``adc_dist`` the lattice image of
    exactly ``0.5 * |qres - decoded_residual|^2 >= 0``."""
    import math

    import numpy as np

    from .clustering import REPLAY_SCORE

    spark = codes.sparkSession
    m = len(codebooks)
    d = len(codebooks[0][0])
    cm = np.asarray(coarse, dtype=np.float64)  # (cells, dim)
    half_c2 = 0.5 * (cm * cm).sum(axis=1)
    scale = 10.0 ** REPLAY_SCORE
    qrows = queries.select(
        F.col(id_col), as_double(vec_col).alias("__v__")
    ).collect()
    trows = []
    for r in qrows:
        qv = np.asarray(r["__v__"], dtype=np.float64)
        fs = np.floor((half_c2 - cm @ qv) * scale)
        order = np.lexsort((np.arange(len(coarse)), fs))[:nprobe]
        for cell in order:
            qres = qv - cm[cell]
            qc = int(math.floor(0.5 * float(qres @ qres) * scale))
            for j, book in enumerate(codebooks):
                bm = np.asarray(book, dtype=np.float64)  # (k, d)
                scores = 0.5 * (bm * bm).sum(axis=1) - bm @ qres[
                    j * d : (j + 1) * d
                ]
                for c, s in enumerate(scores):
                    t = int(math.floor(s * scale)) + (qc if j == 0 else 0)
                    trows.append((r[id_col], int(cell), j, c, t))
    tdf = spark.createDataFrame(
        trows, "query_id long, cell int, j int, c int, t long"
    )
    code_arr = F.array(*[F.col(f"code_{j}") for j in range(m)])
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        F.posexplode(code_arr).alias("j", "c"),
    )
    dist = (
        exploded.join(F.broadcast(tdf), ["cell", "j", "c"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("t").alias("adc_dist"))
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_dist")
    )


# -- Johnson-Lindenstrauss random projection --------------------------------

#: Fixed-point lattice for JL projections: embeddings are floored
#: onto 1e-6 BEFORE projecting, so projections, distances, and
#: rankings are exact integer arithmetic — order-free and replayable
#: in any engine (the dsir.py discipline applied to vectors).
JL_FP = 10**6


def jl_signs(in_dim: int, out_dim: int, seed: int = 0) -> list[list[int]]:
    """Deterministic Rademacher (+/-1) projection matrix, one row per
    output dimension, derived from md5 parity of ``(seed, k, j)``.
    Computed driver-side once and shipped as LITERALS to both the
    Spark plan and the generated SQL oracle — no per-row hashing, and
    both engines see the identical matrix by construction. A +/-1
    matrix satisfies the JL lemma with the same distortion bounds as
    Gaussian entries (Achlioptas, "Database-friendly random
    projections", 2001) while keeping every product integer-exact."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"jl|{seed}|{k}|{j}".encode()).hexdigest()[:2], 16
            )
            % 2
            == 0
            else -1
            for j in range(in_dim)
        ]
        for k in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    out_dim: int = 16,
    seed: int = 0,
    in_dim: int | None = None,
) -> DataFrame:
    """Project embeddings onto ``out_dim`` Rademacher directions:
    ``(id, proj array<bigint>)`` with ``proj[k] = sum_j s_kj *
    floor(double(v_j) * 1e6)``. A pure scan-side projection — the
    sign matrix constant-folds into the plan, nothing shuffles, and
    the 4x-16x narrower integer vectors are what downstream distance
    scans read (the point of JL at 100 TB: distance work and shuffle
    width drop by d/out_dim with rank quality bounded by the JL
    lemma)."""
    d = in_dim if in_dim is not None else vector_dim(df, vec_col)
    signs = jl_signs(d, out_dim, seed)
    vq = F.transform(
        as_double(vec_col), lambda x: F.floor(x * F.lit(float(JL_FP)))
    )
    comps = []
    for k in range(out_dim):
        sk = F.array(*[F.lit(s) for s in signs[k]])
        comps.append(
            F.aggregate(
                F.zip_with(vq, sk, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
    return df.select(
        F.col(id_col).alias("id"), F.array(*comps).alias("proj")
    )


def _int_l2(a, b):
    """Exact integer squared L2 between two array<bigint> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _lattice_vectors(
    corpus: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """``(id, vq array<bigint>)``: the corpus on the 1e-6 fixed-point
    lattice — the exact-ground-truth representation the recall evals
    rank in."""
    return corpus.select(
        F.col(id_col).alias("id"),
        F.transform(
            as_double(vec_col), lambda x: F.floor(x * F.lit(float(JL_FP)))
        ).alias("vq"),
    )


def _panel_topk(frame: DataFrame, col: str, n_queries: int, k: int) -> DataFrame:
    """Brute-force top-``k`` neighbors per panel query over a
    ``(id, <col> array<bigint>)`` frame: the panel is the
    ``n_queries`` SMALLEST ids (orderBy + limit — no dense-0-based-id
    assumption, r9 ADVICE; bounded and corpus-independent, so it
    broadcasts by the repo rule), distances are exact BIGINT squared
    L2, ties break to the lowest neighbor id, self-matches excluded,
    and the per-query window gets WindowGroupLimit pushdown. Shared
    by :func:`jl_recall_eval` (both rankings) and
    :func:`ivfpq_recall_eval` (exact side) so the lattice/tie-break
    discipline lives in exactly one place (r10 review)."""
    q = (
        frame.orderBy("id")
        .limit(n_queries)
        .select(F.col("id").alias("query_id"), F.col(col).alias("qv"))
    )
    d = (
        frame.crossJoin(F.broadcast(q))
        .where(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            _int_l2(F.col(col), F.col("qv")).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id")
    )


def jl_recall_eval(
    corpus: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    out_dim: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Recall@k of JL-projected brute-force kNN against exact kNN on
    the same fixed-point lattice: ``(query_id, n_overlap, recall_at_k)``
    — the measurement that justifies (or vetoes) shipping the
    narrower vectors. The query panel is the ``n_queries`` SMALLEST
    ids (orderBy + limit — no dense-0-based-id assumption; bounded,
    corpus-independent => broadcastable by the repo rule); both
    distance scans stream the corpus once, keep top-k per query
    through one window each, and the two neighbor sets join on
    ``(query_id, neighbor_id)``. Every distance is an exact BIGINT,
    so ranking (ties broken by neighbor id) is engine-replayable."""
    pj = jl_project(corpus, id_col, vec_col, out_dim=out_dim, seed=seed)
    vq = _lattice_vectors(corpus, id_col, vec_col)
    approx = _panel_topk(pj, "proj", n_queries, k)
    exact = _panel_topk(vq, "vq", n_queries, k)
    # left join so a query whose projected top-k misses EVERY exact
    # neighbor still reports recall 0 instead of vanishing from the
    # eval (caught by the r9 100x spotcheck: 6 of 10 rows at 1x)
    return (
        exact.join(
            approx.withColumn("__hit__", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("__hit__", F.lit(0))).alias("n_overlap"))
        .select(
            "query_id",
            "n_overlap",
            (F.col("n_overlap") / F.lit(float(k))).alias("recall_at_k"),
        )
    )


def ivfpq_recall_eval(
    corpus: DataFrame,
    *,
    nprobes: tuple[int, ...] = (1, 2, 4),
    n_queries: int = 10,
    k: int = 5,
    cells: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    pq_k: int = 16,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of :func:`ivfpq_topk` against exact brute-force kNN,
    per ``nprobe`` setting: ``(nprobe, query_id, n_overlap,
    recall_at_k)`` — THE tuning table for the production ANN index
    (FAISS's recall-vs-nprobe sweep): a practitioner reads it to pick
    the smallest ``nprobe`` whose recall clears their bar, i.e. how
    many inverted lists each query must pay to scan.

    Each ``nprobe`` runs the PRODUCTION :func:`ivfpq_topk` verbatim
    on one shared :func:`ivfpq_index` (an eval that re-implements the
    search path measures the re-implementation, not the index). The
    exact side is brute-force top-k on the 1e-6 fixed-point lattice
    (exact BIGINT distances, ties to the lowest id — the
    :func:`jl_recall_eval` discipline), and queries whose ANN top-k
    misses every true neighbor still report recall 0 through the
    left join (the r9 zero-overlap lesson). The query panel is the
    ``n_queries`` smallest ids (orderBy + limit — no dense-id
    assumption).

    Scale shape: the index builds once; each probe setting's search
    is inverted-list-bounded exactly as production; the exact scan is
    one corpus pass against a broadcast panel with WindowGroupLimit
    top-k. Output is ``len(nprobes) * n_queries`` rows.
    """
    from functools import reduce

    coarse, books, codes = ivfpq_index(
        corpus, cells=cells, coarse_iters=coarse_iters, m=m, k=pq_k,
        pq_iters=pq_iters, id_col=id_col, vec_col=vec_col,
    )
    # ONE TakeOrdered job collects the panel; each per-nprobe
    # production search then collects its queries from this local
    # relation instead of re-running the corpus scan (r11 opt:
    # len(nprobes) corpus jobs -> 1). Rows are identical by
    # construction — ivfpq_topk still runs verbatim on a queries
    # frame with the same (id, as_double vector) values.
    panel_sel = corpus.orderBy(id_col).limit(n_queries).select(
        F.col(id_col), as_double(vec_col).alias(vec_col)
    )
    panel = corpus.sparkSession.createDataFrame(
        panel_sel.collect(), panel_sel.schema
    )

    # exact ground truth: lattice-quantized squared L2, top-k per
    # query — the shared _panel_topk discipline (one copy, r10 review)
    exact = _panel_topk(
        _lattice_vectors(corpus, id_col, vec_col), "vq", n_queries, k
    )

    approx = reduce(
        DataFrame.unionByName,
        [
            ivfpq_topk(
                codes, panel, coarse, books, nprobe=np_, k=k,
                id_col=id_col, vec_col=vec_col,
            ).select(
                F.lit(np_).cast("int").alias("nprobe"),
                "query_id",
                "neighbor_id",
                F.lit(1).alias("__hit__"),
            )
            for np_ in nprobes
        ],
    )
    probes = corpus.sparkSession.createDataFrame(
        [(int(np_),) for np_ in nprobes], "nprobe int"
    )
    return (
        exact.crossJoin(F.broadcast(probes))
        .join(approx, ["nprobe", "query_id", "neighbor_id"], "left")
        .groupBy("nprobe", "query_id")
        .agg(F.sum(F.coalesce("__hit__", F.lit(0))).alias("n_overlap"))
        .select(
            "nprobe",
            "query_id",
            "n_overlap",
            (F.col("n_overlap") / F.lit(float(k))).alias("recall_at_k"),
        )
    )


def ivfpq_append(
    new_vectors: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode NEW vectors against a FROZEN IVF-PQ index — the
    incremental-ingest path of a production ANN index (FAISS
    ``add`` after ``train``): assign each vector its coarse cell,
    take the residual against that cell's centroid, and PQ-encode
    the residual under the existing codebooks. Returns a frame with
    exactly :func:`ivfpq_index`'s ``codes`` schema (``id_col,
    code_0..code_{m-1}, cell``) ready to union/append onto the codes
    table; :func:`ivfpq_topk` then retrieves the appended vectors
    under the same probe bound, no retrain, no touch of existing
    codes.

    Byte-identical contract (pinned by test): appending the index's
    own training vectors reproduces the index's codes exactly — the
    assignment, residual subtract, and sub-assignments are the same
    replayable expressions ivfpq_index runs, so encode(new) is a
    pure function of (vectors, coarse, codebooks).

    Scale shape: pure per-row projection — one Arrow-batched coarse
    assignment matmul, one ``zip_with`` subtract against the
    constant-folded centroid map, ``m`` sliced sub-assignments; no
    shuffle, no join (the cell rides the frame through the encode
    loop instead of re-joining as the index build does), nothing
    driver-side. Appending a billion rows is one scan.
    """
    from .clustering import assign_clusters

    m = len(codebooks)
    d = len(codebooks[0][0])
    base = new_vectors.select(
        F.col(id_col), as_double(vec_col).alias("__v__")
    )
    asg = assign_clusters(base, coarse, "__v__", "cell", replayable=True)
    cmap = F.create_map(
        *[
            c
            for cell, cen in enumerate(coarse)
            for c in (F.lit(cell), F.array(*[F.lit(x) for x in cen]))
        ]
    )
    out = asg.select(
        F.col(id_col),
        "cell",
        F.zip_with(
            "__v__", F.element_at(cmap, F.col("cell")), lambda a, b: a - b
        ).alias("__res__"),
    )
    for j in range(m):
        out = assign_clusters(
            out.withColumn("__sub__", F.slice("__res__", j * d + 1, d)),
            codebooks[j],
            "__sub__",
            f"code_{j}",
            replayable=True,
        ).drop("__sub__")
    return out.select(
        F.col(id_col), *[F.col(f"code_{j}") for j in range(m)], F.col("cell")
    )
