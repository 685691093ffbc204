"""Deterministic sampling and dataset splitting.

Training-data pipelines need splits and samples that are (a) stable
across reruns and cluster sizes, (b) reproducible from the row's own
identity, and (c) cheap — a projection, not a shuffle. Spark's
``df.sample``/``randomSplit`` give none of these (they seed per
partition, so adding an executor reassigns rows). Everything here
derives the decision from a multiplicative hash of the row's id, so
the same row lands in the same split on any cluster, any day, and the
filter pushes down to the scan like any other predicate.

The hash is Knuth's multiplicative scheme (id+seed times 2654435761,
the golden-ratio constant, mod 2^32) rather than ``xxhash64`` so the
exact same arithmetic is expressible in any SQL engine — the
correctness oracles replay it verbatim in DuckDB. For adversarial
inputs (ids chosen to collide) swap in ``F.xxhash64``; for organic
ids the multiplicative mix is unbiased in the low bits we use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth's multiplicative constant: 2^32 / golden ratio, odd.
_KNUTH = 2654435761
_M32 = 2**32


def hash_bucket(id_col: Column | str, buckets: int = 100, seed: int = 0) -> Column:
    """Deterministic bucket in [0, buckets) from an integer id.

    All arithmetic stays under 2^63 for ids up to ~3.4e9 even in
    ANSI mode (no overflow-wrap to rely on); for wider id spaces,
    pre-fold the id with ``pmod(id, 2**31)``.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        F.pmod((c + F.lit(seed)) * F.lit(_KNUTH), F.lit(_M32)), F.lit(buckets)
    )


def hash_split(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Add a split label column ("train"/"val"/"test"/...) assigning
    each row by its id hash; fractions must sum to 1.0 (2-decimal
    granularity). Pure projection — no shuffle, no state, and the
    assignment never changes when the data is repartitioned, appended
    to, or re-read.
    """
    total = round(sum(splits.values()), 9)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bucket = hash_bucket(id_col, 100, seed)
    expr: Column | None = None
    lo = 0.0
    for name, frac in splits.items():
        hi = lo + frac * 100
        cond = bucket < F.lit(int(round(hi)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    # chained when(): the first matching upper bound wins, so each row
    # falls in exactly one half-open bucket range.
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep ~fraction of rows, chosen deterministically by id hash
    (2-decimal granularity). The filter is an ordinary pushed-down
    predicate: at 100 TB this reads and discards at scan speed with
    zero shuffle. Per-stratum rates stay equal because the hash is
    independent of any data column — to OVERsample a stratum, union
    two calls with different fractions filtered per stratum.
    """
    return df.filter(hash_bucket(id_col, 100, seed) < int(round(fraction * 100)))


def deterministic_sample_topk(
    df: DataFrame, k: int, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Exactly-k uniform-ish sample: order by the id hash, take k.
    TakeOrderedAndProject keeps only k rows per partition in flight
    (no global sort materialization), so this is the scalable way to
    get a fixed-size deterministic sample of a huge table.
    """
    c = F.col(id_col)
    h = F.pmod((c + F.lit(seed)) * F.lit(_KNUTH), F.lit(_M32))
    return df.orderBy(h.asc(), c.asc()).limit(k)
