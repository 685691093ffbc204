"""Streaming segment-level dedup.

The streaming counterpart of ``operators/spans.py:segment_dedup``:
documents arrive on a stream, split into segments, and only the
FIRST arrival of each distinct segment within the watermark horizon
passes through — ``dropDuplicatesWithinWatermark`` keyed on the
segment digest, so state is one digest per distinct recent segment
and is evicted as the watermark advances (plain ``dropDuplicates``
would pin every segment ever seen).

Semantic deviation from the batch operator (documented): "first
occurrence" is FIRST ARRIVAL in stream order, not the globally
smallest ``(id, index)`` — a stream has no second pass to establish
a global order. The set of surviving segment VALUES is identical;
which document contributes a survivor is arrival-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relationalize_spark.operators.spans import _digest, _segments, _tokens


def stream_segment_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    *,
    seg_words: int = 10,
    delimiter: str | None = None,
    watermark: str = "1 hour",
    digest: str = "xxhash64",
) -> DataFrame:
    """Streaming keep-first segment dedup; returns the exploded
    stream of surviving ``(id, idx, seg, ts)`` rows."""
    if delimiter is not None:
        segs = F.split(F.col(text_col), delimiter)
    else:
        segs = _segments(_tokens(F.col(text_col)), seg_words)
    exploded = stream.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("__ts__"),
        F.posexplode(segs).alias("idx", "seg"),
    ).withColumn("__key__", _digest(F.col("seg"), digest))
    return (
        exploded.withWatermark("__ts__", watermark)
        .dropDuplicatesWithinWatermark(["__key__"])
        .select("id", "idx", "seg", F.col("__ts__").alias(ts_col))
    )
