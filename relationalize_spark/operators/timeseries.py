"""Hypertable-style time-series rollups: bucketed downsampling with
gap-filling and last-observation-carried-forward interpolation.

The reference engine family exposes continuous-aggregate / rollup
views over time-partitioned tables; the Spark-native formulation is:

1. ``time_bucket`` — integer epoch arithmetic (no timezone traps),
   fully codegen'd, so the bucket column costs one projection.
2. ``rollup_time_buckets`` — an ordinary groupBy(key, bucket): partial
   aggregation makes the shuffle proportional to *buckets*, not rows.
3. ``gap_fill_locf`` — densify each key's bucket range with
   ``sequence``+``explode`` (rows created = missing buckets only) and
   carry values forward with one window pass per key.

Scale: the rollup shuffles once on (keys, bucket); the spine is built
from a tiny per-key (min,max) aggregate — its explode fans out to
range/width rows per key, which is bounded by the retention window,
not the event volume. The final LOCF is one sort per key over bucket
rows (already small). No step touches Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.timeutil import (
    col_epoch_micros,
    epoch_micros,
    micros_to_timestamp,
)

_IDX = "__bucket_idx__"


def time_bucket(
    ts: str | Column, width_s: int, dtype: T.DataType | None = None
) -> Column:
    """Truncate a timestamp to its containing ``width_s``-second
    bucket, as a timestamp of the same flavor. Pure integer micros
    arithmetic: identical semantics in every engine and timezone-free
    (DuckDB's ``time_bucket`` and TimescaleDB's agree on epoch-aligned
    widths). ``dtype`` is the column's Spark type (TIMESTAMP or
    TIMESTAMP_NTZ); pass it when known so NTZ inputs stay wall-clock."""
    col = F.col(ts) if isinstance(ts, str) else ts
    width_us = int(width_s) * 1_000_000
    us = epoch_micros(col, dtype or T.TimestampType())
    return micros_to_timestamp(
        (us / F.lit(width_us)).cast("long") * F.lit(width_us), dtype
    )


def bucket_index(
    ts: str | Column, width_s: int, dtype: T.DataType | None = None
) -> Column:
    """The bucket's integer index (epoch_micros div width) — join- and
    sequence-friendly; convert back with ``micros_to_timestamp(idx*width)``."""
    col = F.col(ts) if isinstance(ts, str) else ts
    width_us = int(width_s) * 1_000_000
    us = epoch_micros(col, dtype or T.TimestampType())
    return (us / F.lit(width_us)).cast("long")


def rollup_time_buckets(
    df: DataFrame,
    keys: list[str],
    ts: str,
    width_s: int,
    aggs: list[Column],
    bucket_col: str = "bucket_idx",
) -> DataFrame:
    """Downsample: one row per (keys, bucket) with the given aggregate
    expressions. One shuffle, map-side combined."""
    dtype = df.schema[ts].dataType
    return (
        df.withColumn(bucket_col, bucket_index(ts, width_s, dtype))
        .groupBy(*keys, bucket_col)
        .agg(*aggs)
    )


def gap_fill_locf(
    rolled: DataFrame,
    keys: list[str],
    bucket_col: str,
    width_s: int,
    locf_cols: list[str],
    *,
    counter_cols: list[str] | None = None,
    bucket_ts_col: str = "bucket_start",
    filled_col: str = "filled",
    ts_dtype: T.DataType | None = None,
) -> DataFrame:
    """Densify a rolled-up frame so every key has a row for every
    bucket between its first and last observation, then carry each
    ``locf_cols`` value forward into the generated rows.

    ``counter_cols`` are zero-filled instead (counts/sums of absent
    data are 0, while a gauge's last observation persists).
    ``filled_col`` marks synthesized rows. The original (sparse)
    value column is preserved as-is — gap rows hold NULL there.
    """
    counter_cols = counter_cols or []
    width_us = int(width_s) * 1_000_000

    spine = (
        rolled.groupBy(*keys)
        .agg(
            F.min(bucket_col).alias("__lo__"),
            F.max(bucket_col).alias("__hi__"),
        )
        .select(
            *keys,
            F.explode(F.sequence(F.col("__lo__"), F.col("__hi__"))).alias(_IDX),
        )
    )
    joined = spine.join(
        rolled.withColumnRenamed(bucket_col, _IDX), [*keys, _IDX], "left"
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(_IDX))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # filled = no source row joined: every rolled column is null there.
    probe = (counter_cols + locf_cols)[0]
    out = joined.withColumn(filled_col, F.col(probe).isNull())
    for c in locf_cols:
        out = out.withColumn(f"{c}_locf", F.last(c, ignorenulls=True).over(w))
    for c in counter_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0).cast("long")))
    return out.withColumn(
        bucket_ts_col,
        micros_to_timestamp(F.col(_IDX) * F.lit(width_us), ts_dtype),
    ).drop(_IDX)


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    width_s: int = 7 * 86400,
    dtype: T.DataType | None = None,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity
    period, counted in each later period they return.

    Returns ``(cohort_start, period_offset, n_users)`` — cohort_start
    is the epoch-aligned bucket timestamp of the cohort's first
    activity, period_offset counts buckets since then (0 = the
    cohort's own period), n_users is distinct active users. The
    classic product-analytics triangle; at scale it is two shuffles
    (user-distinct activity, then the cohort fold), both on keys the
    data is naturally grouped by.

    Buckets use the same integer epoch arithmetic as
    :func:`time_bucket` — engine- and timezone-neutral, exact for any
    ``width_s``.
    """
    if dtype is None:
        dtype = df.schema[ts_col].dataType
    act = (
        df.select(
            F.col(user_col).alias("__u__"),
            bucket_index(ts_col, width_s, dtype).alias("__b__"),
        )
        .distinct()
    )
    w = Window.partitionBy("__u__")
    cohorted = act.withColumn("__cohort__", F.min("__b__").over(w))
    width_us = int(width_s) * 1_000_000
    return (
        cohorted.groupBy("__cohort__", (F.col("__b__") - F.col("__cohort__")).alias("period_offset"))
        .agg(F.count_distinct("__u__").alias("n_users"))
        .select(
            micros_to_timestamp(
                F.col("__cohort__") * F.lit(width_us), dtype
            ).alias("cohort_start"),
            "period_offset",
            "n_users",
        )
    )


#: Fixed-point lattice for interpolated values (the engine-wide
#: replayable-arithmetic discipline applied to gauges).
TS_FP = 10**6


def gapfill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    *,
    step_s: int = 3600,
) -> DataFrame:
    """Regularize ``(key, ts, value)`` onto a ``step_s``-second grid
    with LINEAR INTERPOLATION across the holes — the companion to
    :func:`gap_fill_locf` for gauges where carrying the last value
    flat misrepresents a trend (sensor readings, prices, rates).

    Returns one row per key per grid bucket between that key's first
    and last observed bucket (inclusive):

    - ``key, bucket_start`` (epoch seconds, BIGINT — engine- and
      timezone-neutral),
    - ``n_obs`` (observations aggregated into the bucket; 0 = hole),
    - ``value`` — the observed bucket mean, or the linear
      interpolation between the neighboring observed buckets
      (weights are integer bucket distances); floored onto the 1e-6
      lattice,
    - ``src`` — ``observed`` / ``interp``. One-sided holes cannot
      occur: the grid spans each key's [first, last] OBSERVED
      bucket, so every hole has observed neighbors on both sides
      (for edge extension use :func:`gap_fill_locf`, whose carry
      semantics are what an out-of-range fill means anyway) —
      the dead locf/nocb branches were trimmed per r9 ADVICE.

    Replayable arithmetic: observed values quantize to BIGINT quanta
    BEFORE the bucket mean, so the mean, the interpolation expression
    (fixed IEEE op order, exact integer inputs), and the final floor
    are identical in every engine — the q148 oracle replays every
    interpolated cell bit-for-bit.

    Scale shape: one partial-aggregated shuffle onto ``(key,
    bucket)``, a per-key (min, max) aggregate riding the same key
    hash, one output-proportional ``sequence`` explode, and two
    window passes over the grid (each key's grid sorts once — the
    natural clustering downstream rollups read). Nothing corpus-wide
    joins or broadcasts.
    """
    bucket = (
        F.floor(col_epoch_micros(df, ts_col) / F.lit(1_000_000 * step_s))
        * step_s
    ).alias("bucket_start")
    obs = (
        # NULL-valued rows are dropped BEFORE bucketing: an all-NULL
        # bucket would otherwise count as "observed" (anchoring the
        # grid) while contributing no value — recreating the
        # one-sided-hole case the trimmed locf/nocb branches no
        # longer handle (r10 review). With the filter, "observed"
        # means "has at least one non-NULL value", and every hole
        # provably has valued neighbors on both sides.
        df.where(F.col(val_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            bucket,
            F.floor(F.col(val_col) * F.lit(float(TS_FP)))
            .cast("long")
            .alias("vq"),
        )
        .groupBy("key", "bucket_start")
        .agg(F.count(F.lit(1)).alias("n_obs"), F.sum("vq").alias("sq"))
        .select(
            "key",
            "bucket_start",
            "n_obs",
            (F.col("sq").cast("double") / F.col("n_obs")).alias("oq"),
        )
    )
    grid = (
        obs.groupBy("key")
        .agg(
            F.min("bucket_start").alias("lo"),
            F.max("bucket_start").alias("hi"),
        )
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.lit(step_s).cast("long"))
            ).alias("bucket_start"),
        )
    )
    # merge hint: obs is corpus-derived ((key, bucket) cardinality
    # grows with the data), so a static broadcast promotion would OOM
    # at scale; the sort-merge join shares the (key, bucket) exchange
    # the window passes need anyway (audited r9).
    g = grid.join(obs.hint("merge"), ["key", "bucket_start"], "left")
    prev = Window.partitionBy("key").orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, -1
    )
    nxt = Window.partitionBy("key").orderBy("bucket_start").rowsBetween(
        1, Window.unboundedFollowing
    )
    pb = F.last(
        F.when(F.col("oq").isNotNull(), F.col("bucket_start")), True
    ).over(prev)
    pv = F.last("oq", True).over(prev)
    nb = F.first(
        F.when(F.col("oq").isNotNull(), F.col("bucket_start")), True
    ).over(nxt)
    nv = F.first("oq", True).over(nxt)
    interp = pv + (nv - pv) * (
        (F.col("bucket_start") - pb).cast("double") / (nb - pb).cast("double")
    )
    # every hole lies strictly between two observed buckets (grid
    # spans [first, last] observed), so pv/nv are always defined here
    filled_q = F.when(F.col("oq").isNotNull(), F.col("oq")).otherwise(interp)
    src = F.when(
        F.col("oq").isNotNull(), F.lit("observed")
    ).otherwise(F.lit("interp"))
    return g.select(
        F.col("key").alias(key_col),
        "bucket_start",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        (F.floor(filled_q).cast("double") / F.lit(float(TS_FP))).alias(
            "value"
        ),
        src.alias("src"),
    )
