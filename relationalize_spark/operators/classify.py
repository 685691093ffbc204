"""Distributed hashed-feature text classification (fastText-style
linear model), Spark-first.

The standard quality-classifier step in large-scale training-data
curation (GPT-3's LR quality filter over hashed features; fastText's
linear bag-of-tokens model; CCNet's fasttext lang/quality stages):
hash tokens into a fixed-width feature space, train a logistic
regression by full-batch gradient descent, score every document.
The reference engine has no ML surface; this belongs to the
large-scale toolkit beside clustering/similarity/dedup.

Spark-first shape (the Lloyd's pattern from
:mod:`relationalize_spark.operators.clustering` applied to GD):

- **Features are built once** — ``explode(tokens) -> (doc, bucket)
  count -> per-doc sparse vector row`` — and cached; the build is the
  only document-key shuffle in the whole fit.
- **Each GD iteration is ONE pass over the cached features**: the
  current weight vector is a plan literal (constant-folded map, the
  centroid-literal trick), the margin/sigmoid/error is computed
  scan-side per row, and the per-bucket gradient is a map-side
  combined shuffle of at most ``dim + 1`` keys — reduction traffic
  independent of the corpus size.
- **Driver state is O(dim) doubles** per iteration.

At 100 TB the per-iteration cost is one cached scan plus one
``dim``-row shuffle — the floor for exact full-batch GD (this is the
same aggregation shape MLlib's own LBFGS/GD tree-aggregations use).

Engine-replayable determinism (what gives the fit a TRUE chained-CTE
SQL value oracle, q131, instead of a rows-only check — the q121
PageRank / q67 k-means quantization discipline):

- every cross-row SUM rides a fixed-point BIGINT lattice
  (``floor(v * 10^s)``), so partial-aggregation order cannot change
  the result in any engine;
- the one transcendental (``exp`` inside the sigmoid) is immediately
  floored to the 1e-9 lattice: engines' ``exp`` may legally differ in
  the last ulp (~1e-16 relative), which flips a floored value only
  when the true sigmoid sits within ~1e-16 of a lattice point —
  ~1e-7 per evaluation, negligible across a gate run;
- weights are quantized after each step by flooring onto the 1e-12
  lattice (``floor(v * 1e12) / 1e12`` — the identical IEEE
  multiply/floor/divide chain in Python, Spark, and DuckDB;
  ``floor``, not ``round``, because Python rounds half-even while
  SQL engines round half-away — the clustering-module precedent), so
  the weight trajectory is part of the contract;
- the token -> bucket hash is ``md5``-derived (the md5_60 lane from
  :mod:`relationalize_spark.operators.dedup`), computable in any SQL
  engine, rather than the engine-specific ``xxhash64``.

Reference parity: none (capability beyond the reference's surface,
cited as such in SURVEY.md §8.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.scale import ensure_parallelism

#: Fixed-point scales (decimal digits). DOT rides 1e12 (weight*tf
#: products are small, |z| stays well inside the ~9.2e18 BIGINT range
#: even at billions of features per doc); SIGMOID/GRAD ride 1e9 —
#: wide enough that 9-decimal training noise is irrelevant, narrow
#: enough that a 1-ulp cross-engine ``exp`` divergence almost never
#: crosses a lattice boundary (see module docstring).
REPLAY_DOT = 12
REPLAY_GRAD = 9
#: Weight quantization (decimals) after each GD step — floor onto
#: this lattice, never round (see module docstring).
REPLAY_W = 12

#: Intercept pseudo-bucket: every document carries feature
#: ``(INTERCEPT, 1.0)`` so the bias trains through the same shuffle.
INTERCEPT = -1


def hash_bucket(tok: Column, dim: int) -> Column:
    """Engine-replayable token -> feature bucket: the first 15 md5
    hex chars as a 60-bit non-negative BIGINT (dedup.py's md5_60
    lane), mod ``dim``. Any SQL engine computes the identical bucket:
    ``CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % dim``."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long") % dim
    ).cast("int")


def hashed_features(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 32,
) -> DataFrame:
    """One row per non-empty document:
    ``id, y (double 0/1), feats array<struct<j int, x double>>``.

    ``x`` is the relative token frequency of bucket ``j`` (count /
    doc token count — an exact IEEE division, so any engine computes
    the identical double). The intercept rides along as bucket
    ``INTERCEPT`` with ``x = 1.0``. Documents with zero tokens carry
    no signal and are excluded (mirrored by the oracle's
    ``len(tokens) > 0``).

    Plan: tokenize -> explode -> ``groupBy(id, bucket)`` count ->
    ``groupBy(id)`` collect. Two document-key shuffles, paid ONCE;
    every GD iteration then reads the cached result. Struct array is
    sorted by bucket for a deterministic per-row layout."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    base = df.select(
        F.col(id_col).alias("id"),
        label.cast("double").alias("y"),
        toks.alias("__toks__"),
    ).where(F.size("__toks__") > 0)
    counts = (
        base.select(
            "id", "y",
            F.size("__toks__").cast("double").alias("__n__"),
            F.explode("__toks__").alias("__tok__"),
        )
        .groupBy("id", "y", "__n__", hash_bucket(F.col("__tok__"), dim).alias("j"))
        .agg(F.count(F.lit(1)).cast("double").alias("__c__"))
    )
    return counts.groupBy("id", "y").agg(
        F.array_sort(
            F.array_append(
                F.collect_list(
                    F.struct(
                        F.col("j"),
                        (F.col("__c__") / F.col("__n__")).alias("x"),
                    )
                ),
                F.struct(
                    F.lit(INTERCEPT).alias("j"), F.lit(1.0).alias("x")
                ),
            )
        ).alias("feats")
    )


def _check_weights(
    weights: dict[int, float], dim: int, *, intercept: bool = True
) -> None:
    """Fail fast on a weights/dim mismatch. A map literal built from
    ``weights`` returns NULL from ``element_at`` for any missing
    bucket, and that NULL is indistinguishable from the documented
    empty-document NULL — scoring with the wrong ``dim`` would
    silently drop every row instead of erroring."""
    missing = [j for j in range(dim) if j not in weights]
    if intercept and INTERCEPT not in weights:
        missing.append(INTERCEPT)
    if missing:
        raise ValueError(
            f"weights do not cover dim={dim}: missing buckets "
            f"{missing[:8]}{'...' if len(missing) > 8 else ''} "
            "(was the model fit with a different dim?)"
        )


def _wmap(weights: dict[int, float]) -> Column:
    """The current weight vector as a map literal — all children are
    literals, so Catalyst's ConstantFolding collapses it to one map
    constant in the plan (the k-means centroid-literal trick: weights
    ship inside the task binary, no join, no broadcast exchange)."""
    pairs: list[Column] = []
    for j in sorted(weights):
        pairs.append(F.lit(j))
        pairs.append(F.lit(weights[j]))
    return F.create_map(*pairs)


def logreg_fit(
    feats: DataFrame,
    *,
    dim: int = 32,
    lr: float = 2.0,
    iters: int = 3,
) -> dict[int, float]:
    """Full-batch gradient descent from w = 0; returns
    ``{bucket: weight}`` including ``INTERCEPT``.

    Per iteration, entirely scan-side until the final dim-key shuffle:

    - ``zq = sum_feats floor(w[j] * x * 1e12)`` — a BIGINT fold over
      the per-row struct array (order-free by integer associativity),
    - ``p = sigmoid(zq / 1e12)`` floored to the 1e-9 lattice,
    - per-(row, bucket) gradient quantum ``floor((p - y) * x * 1e9)``
      exploded and summed per bucket: map-side partials collapse each
      partition to <= dim+1 rows before the shuffle,
    - driver updates ``w[j] -= lr * grad_j / n`` and floors the
      result onto the ``REPLAY_W``-decimal lattice.

    ``feats`` should be the (cached) output of
    :func:`hashed_features`; ``n`` is computed from it once.
    """
    import math

    dot_fp = float(10 ** REPLAY_DOT)
    grad_fp = float(10 ** REPLAY_GRAD)
    w_fp = float(10 ** REPLAY_W)
    n = feats.count()
    if n == 0:
        raise ValueError("no non-empty documents to train on")
    # right-size the iterated frame: feats leaves hashed_features'
    # groupBy with a full shuffle.partitions fanout regardless of row
    # count, and every GD iteration re-reads it (r11 opt — the
    # kmeans_fit rationale; gradient sums are BIGINT quanta, so
    # partitioning is result-neutral). coalesce reads THROUGH the
    # cache, so the one-time feature build still fills it wide.
    from ..plans.scale import right_size_partitions

    feats = right_size_partitions(feats, n)
    w: dict[int, float] = {j: 0.0 for j in range(dim)}
    w[INTERCEPT] = 0.0
    for _ in range(iters):
        wm = _wmap(w)
        zq = F.aggregate(
            "feats",
            F.lit(0).cast("bigint"),
            lambda acc, f: acc
            + F.floor(F.element_at(wm, f.j) * f.x * F.lit(dot_fp)),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(zq / F.lit(dot_fp))))
        e = (F.floor(p * F.lit(grad_fp)) - F.col("y") * F.lit(grad_fp)) / F.lit(
            grad_fp
        )
        grads = (
            feats.select(e.alias("__e__"), F.explode("feats").alias("f"))
            .select(
                F.col("f.j").alias("j"),
                F.floor(F.col("__e__") * F.col("f.x") * F.lit(grad_fp)).alias(
                    "gq"
                ),
            )
            .groupBy("j")
            .agg(F.sum("gq").alias("sq"))
            .collect()
        )
        for r in grads:
            v = w[r.j] - lr * ((r.sq / grad_fp) / n)
            w[r.j] = math.floor(v * w_fp) / w_fp
    return w


def hashed_logreg(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 32,
    lr: float = 2.0,
    iters: int = 3,
) -> DataFrame:
    """Train the hashed-feature LR and return the fitted model as a
    ``(feature, weight)`` DataFrame (``dim + 1`` rows, intercept at
    feature ``INTERCEPT``), ordered by feature — the exact frame the
    q131 oracle replays value-for-value."""
    spark = df.sparkSession
    feats = ensure_parallelism(
        hashed_features(df, label, id_col, text_col, dim=dim)
    ).persist()
    try:
        w = logreg_fit(feats, dim=dim, lr=lr, iters=iters)
    finally:
        feats.unpersist()
    rows = [(j, w[j]) for j in sorted(w)]
    return spark.createDataFrame(rows, "feature int, weight double")


def stateless_score_col(
    weights: dict[int, float],
    text_col: str = "text",
    *,
    dim: int = 32,
    as_quanta: bool = False,
) -> Column:
    """Streaming-safe scoring as a PURE EXPRESSION — the form a
    Structured Streaming pipeline needs, because
    :func:`score_documents`' feature build is two aggregations and
    chained streaming aggregations are unsupported.

    Uses the identity ``sum_j w_j * (c_j / n) = (sum_tokens
    w[bucket(tok)]) / n`` to fold the whole dot product over the raw
    token array in one scan-side pass (the DSIR fold shape): zero
    shuffles, zero state, weights constant-folded into the plan. The
    per-row token count is deliberately NOT captured inside the fold
    lambda — Catalyst does no CSE in HOF lambdas, so a captured
    ``size(split(...))`` would re-split the document once PER TOKEN
    (the quadratic trap pinned in BASELINE.md r3); instead the fold
    sums integer quanta and the single division happens once outside.

    Quantization contract (deliberately DIFFERENT from
    :func:`score_documents`' per-feature lattice, and self-consistent):
    ``sq = sum_tokens floor(w[bucket(tok)] * 1e12)`` (an order-free
    BIGINT fold), then ``z = (floor(w_intercept * 1e12) + sq / n) /
    1e12`` (three IEEE ops in a fixed order) and the sigmoid floored
    onto the 1e-9 lattice — every term engine-replayable, which is
    what gives the streaming query (q141) a full value oracle.

    ``as_quanta=True`` returns the BIGINT lattice point
    ``floor(score * 1e9)`` instead of the quantized double — the form
    to SUM downstream (re-deriving the integer from the divided-back
    double via another floor could step one lattice point down when
    ``k/1e9 * 1e9`` rounds below ``k``).

    NULL for zero-token documents (no signal; filter them out).
    Raises ``ValueError`` if ``weights`` does not cover
    ``range(dim)`` plus the intercept (a dim mismatch would otherwise
    NULL every row, indistinguishable from empty documents)."""
    import math

    _check_weights(weights, dim)
    wm = _wmap(weights)
    dot_fp = float(10 ** REPLAY_DOT)
    grad_fp = float(10 ** REPLAY_GRAD)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    sq = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.floor(F.element_at(wm, hash_bucket(t, dim)) * F.lit(dot_fp)),
    )
    z = (
        F.lit(float(math.floor(weights[INTERCEPT] * dot_fp)))
        + sq.cast("double") / F.size(toks).cast("double")
    ) / F.lit(dot_fp)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    quanta = F.floor(score * F.lit(grad_fp)).cast("long")
    quant = quanta / F.lit(grad_fp) if not as_quanta else quanta
    return F.when(F.size(toks) > 0, quant)


def score_documents(
    df: DataFrame,
    weights: dict[int, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 32,
    quantize: bool = False,
) -> DataFrame:
    """Score documents under a fitted model: ``id, score`` with
    ``score = sigmoid(w . x + b)`` on the same fixed-point lattice as
    training. Pure projection over the feature build — the weights
    are a folded map literal, so scoring fuses into the scan (zero
    extra shuffles beyond the feature aggregation).

    ``quantize=True`` floors the score onto the 1e-9 lattice (the
    training-side sigmoid treatment), making the output
    engine-replayable — what q135's value oracle checks."""
    _check_weights(weights, dim)
    label = F.lit(0.0)  # unused by scoring; reuse the feature builder
    feats = hashed_features(df, label, id_col, text_col, dim=dim)
    wm = _wmap(weights)
    dot_fp = float(10 ** REPLAY_DOT)
    grad_fp = float(10 ** REPLAY_GRAD)
    zq = F.aggregate(
        "feats",
        F.lit(0).cast("bigint"),
        lambda acc, f: acc + F.floor(F.element_at(wm, f.j) * f.x * F.lit(dot_fp)),
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-(zq / F.lit(dot_fp))))
    if quantize:
        score = F.floor(score * F.lit(grad_fp)) / F.lit(grad_fp)
    return feats.select(F.col("id").alias(id_col), score.alias("score"))
