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

_IDX = "__bucket_idx__"


def time_bucket(ts: str | Column, width_s: int) -> Column:
    """Truncate a timestamp to its containing ``width_s``-second
    bucket, as a timestamp. Pure integer micros arithmetic: identical
    semantics in every engine and timezone-free (DuckDB's
    ``time_bucket`` and TimescaleDB's agree on epoch-aligned widths)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    width_us = int(width_s) * 1_000_000
    return F.timestamp_micros(
        (F.unix_micros(col) / F.lit(width_us)).cast("long") * F.lit(width_us)
    )


def bucket_index(ts: str | Column, width_s: int) -> Column:
    """The bucket's integer index (epoch_micros div width) — join- and
    sequence-friendly; convert back with ``timestamp_micros(idx*width)``."""
    col = F.col(ts) if isinstance(ts, str) else ts
    width_us = int(width_s) * 1_000_000
    return (F.unix_micros(col) / F.lit(width_us)).cast("long")


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
    return (
        df.withColumn(bucket_col, bucket_index(ts, width_s))
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
        bucket_ts_col, F.timestamp_micros(F.col(_IDX) * F.lit(width_us))
    ).drop(_IDX)
