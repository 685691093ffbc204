"""Data-quality auditing: one-pass column profiles and referential
integrity checks.

The reference's pipelines trust their input shape (schema inference
handles drift, reference schema.py:36-64, but nothing validates
*values*). A 100 TB ingest needs the audit primitives warehouses run
before load: per-column null/distinct/min/max profiles and FK
violation counts. Both are expressed as ordinary aggregations so
Catalyst fuses them with the scan.

``profile_columns`` computes every column's stats in ONE aggregation
pass (multiple DISTINCT aggregates become a single Expand + shuffle),
then unpivots the 1-row result with ``stack`` — no per-column scan,
no driver loop over data. With ``exact=False`` the distinct counts
switch to HyperLogLog++ (``approx_count_distinct``), the right default
at 100 TB where exact distinct of a high-cardinality column is its own
shuffle of every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.lattice import floor_lattice


def profile_columns(
    df: DataFrame, cols: list[str], exact: bool = True
) -> DataFrame:
    """One row per column: (col, n_rows, n_null, n_distinct, min_val,
    max_val), min/max presented as strings so heterogeneous column
    types share one schema."""
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(col, n_null, n_distinct, min_val, max_val)",
    ).select("col", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def fk_violations(
    child: DataFrame, parent: DataFrame, child_keys: list[str], parent_keys: list[str]
) -> DataFrame:
    """Child rows whose key has no match in parent (NULL keys are
    violations too, matching warehouse NOT-ENFORCED-FK audit queries).
    An anti-join — one shuffle, broadcast when the parent is small."""
    on = [child[c].eqNullSafe(parent[p]) for c, p in zip(child_keys, parent_keys)]
    cond = on[0]
    for expr in on[1:]:
        cond = cond & expr
    return child.join(parent, cond, "left_anti")


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive one-row table fingerprint for migration /
    load validation — the strong form of the reference's post-COPY
    ``SELECT COUNT(1)`` check (reference
    examples/full_pokemon_psql_pipeline.py:163-167): equal row count
    AND equal checksum means the loaded table is value-identical, not
    merely the same size.

    ``checksum`` is the XOR of a 60-bit md5 chunk of each row's
    ``\\x1f``-joined string rendering — commutative (no sort needed),
    overflow-free, and expressible verbatim in any engine with md5
    (DuckDB: ``bit_xor(CAST('0x'||substr(md5(r),1,15) AS BIGINT))``
    over ``concat_ws(chr(31), coalesce(CAST(c AS VARCHAR), chr(0)),
    ...)``). XOR cancels duplicate row PAIRS, so ``n_rows`` (and
    ``distinct_rows``) ride along to close that gap.

    Each column renders through ``coalesce(cast(c as string), '\\x00')``
    because ``concat_ws`` SKIPS nulls: without the sentinel,
    ``('a', NULL, 'b')`` and ``('a', 'b', NULL)`` both render
    ``'a\\x1fb'`` and two value-different tables could pass as
    identical. The ``\\x00`` sentinel is distinct from the ``\\x1f``
    separator, so NULL position is part of the fingerprint. (A real
    ``\\x00`` string value still collides with a NULL — acceptable for
    warehouse text; pick other columns if yours contain NUL bytes.)

    Caveat: the row rendering casts values to strings, so use columns
    whose string form is engine-stable (strings, integers, dates);
    floats render differently across engines.
    """
    use = cols or df.columns
    row = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in use],
    )
    chunk = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("bigint")
    return df.select(chunk.alias("__c__"), row.alias("__r__")).agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("__r__").alias("distinct_rows"),
        F.expr("bit_xor(__c__)").alias("checksum"),
    )


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    z_thresh: float = 3.5,
    round_to: int = 6,
) -> DataFrame:
    """Rows whose value is a robust outlier within its group, by the
    Iglewicz-Hoaglin modified z-score ``0.6745 * (x - median) / MAD``
    (median absolute deviation). Median/MAD resist the very outliers
    they hunt, unlike mean/stddev z-scores where one extreme value
    inflates sigma and hides itself — the standard data-quality screen
    before a load.

    Shape: two exact-percentile aggregations (median, then MAD of the
    residuals) — each one shuffle on the group key, the per-group
    stats frames are group-cardinality-sized and joined back (AQE
    broadcasts them when small). Groups with ``MAD = 0`` (over half
    the group shares one value) yield NULL scores and are excluded —
    by construction nothing deviates robustly there.

    Output: the original row plus ``robust_z`` (FLOORED onto the
    ``10^-round_to`` lattice — floor, never round, the r9 q143
    discipline — and the threshold compares the QUANTIZED value so
    any SQL engine replays the same row set).
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(*group_cols).agg(
        F.percentile(v, 0.5).alias("__med__")
    )
    with_med = df.join(med, group_cols)
    mad = with_med.groupBy(*group_cols).agg(
        F.percentile(F.abs(v - F.col("__med__")), 0.5).alias("__mad__")
    )
    z = floor_lattice(
        F.lit(0.6745)
        * (v - F.col("__med__"))
        / F.nullif("__mad__", F.lit(0.0)),
        round_to,
    )
    return (
        with_med.join(mad, group_cols)
        .withColumn("robust_z", z)
        .where(F.abs(F.col("robust_z")) > z_thresh)
        .drop("__med__", "__mad__")
    )


def merge_partial_aggs(
    partials: DataFrame,
    group_cols: list[str],
    *,
    count_col: str = "n",
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Re-aggregate pre-aggregated shards: combine per-shard partial
    aggregates (counts, sums, mins, maxes) into the totals the raw
    data would have produced — ``merge(partial(x)) == total(x)``.

    This is the "combiner as data" pattern behind incremental
    rollups (daily partials folded into monthly without touching raw
    rows) and multi-cluster aggregation, and it is the numeric
    sibling of ``Schema.merge`` (reference schema.py:259-302): both
    exploit that the summary is associative-commutative so shards
    combine in any order. Averages must be carried as (sum, count)
    pairs and derived AFTER the merge — never averaged directly.

    One shuffle on ``group_cols``; input size is shard-count x
    group-count, independent of raw data volume.
    """
    aggs = [F.sum(F.col(count_col)).alias(count_col)]
    for c in sum_cols or []:
        aggs.append(F.sum(F.col(c)).alias(c))
    for c in min_cols or []:
        aggs.append(F.min(F.col(c)).alias(c))
    for c in max_cols or []:
        aggs.append(F.max(F.col(c)).alias(c))
    return partials.groupBy(*group_cols).agg(*aggs)
