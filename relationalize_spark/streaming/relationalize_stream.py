"""Structured Streaming surface.

The reference's single-pass design (write rows as they stream,
reference relationalize.py:54-63) maps to Structured Streaming
directly:

- ``relationalize_stream``: the multi-output demux. A streaming query
  can only have one sink, so the dynamic table fan-out runs inside
  ``foreachBatch``: each micro-batch is relationalized (same plan-time
  operator as batch — schema comes from the stream's fixed schema) and
  each derived table is handed to a user sink callback, mirroring the
  reference's ``create_output`` factory hook (relationalize.py:29).
- ``windowed_counts``: watermarked tumbling-window aggregation — the
  streaming analog of q17_events_hourly; late rows beyond the
  watermark are dropped, state is bounded.
- ``sessionize_stream``: gap-based sessions via the native
  ``session_window`` (stateful, watermark-bounded) — the streaming
  analog of q18_sessionization without custom state handling.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..operators.relationalize import relationalize

TableSink = Callable[[str, DataFrame, int], None]


def relationalize_stream(
    stream_df: DataFrame,
    name: str,
    sink: TableSink,
    *,
    key_cols: list[str] | None = None,
) -> DataStreamWriter:
    """Demux a nested stream into per-table sinks.

    ``sink(table_name, flat_df, batch_id)`` is called once per derived
    table per micro-batch; implementations typically append to one
    parquet/Delta path per table. Returns the unstarted writer so the
    caller picks trigger/checkpoint options.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        for table_name, table_df in relationalize(
            batch_df, name, key_cols=key_cols
        ).items():
            sink(table_name, table_df, batch_id)

    return stream_df.writeStream.foreachBatch(process_batch)


def parquet_table_sink(base_path: str) -> TableSink:
    """A TableSink appending each derived table under its own
    directory — the streaming counterpart of the reference's
    local-file output factory (reference utils.py:5-17)."""

    def sink(table_name: str, df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(f"{base_path}/{table_name}")

    return sink


def _instant_ts(df: DataFrame, ts_col: str) -> DataFrame:
    """Event-time watermarks reject TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); coerce NTZ event time to an
    instant (wall clock taken as UTC, session-timezone-independent)."""
    from pyspark.sql import types as T

    from ..functions.timeutil import as_instant

    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, T.TimestampNTZType):
        df = df.withColumn(ts_col, as_instant(F.col(ts_col), dtype))
    return df


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts; state for windows older
    than the watermark is evicted, so memory is bounded regardless of
    stream length."""
    stream_df = _instant_ts(stream_df, ts_col)
    groups = [F.window(F.col(ts_col), window).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(c) for c in (group_cols or [])],
            "n_events",
        )
    )


def sessionize_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions with native session_window state."""
    stream_df = _instant_ts(stream_df, ts_col)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )
