"""Multimodal (image/audio/video) column plumbing.

Convention: media travels as an opaque ``binary`` column plus typed
metadata columns. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the right shape for per-item Python codecs at scale
(vectorized transfer, no per-row pickling, executor-parallel).

This container has no image/audio libraries, so the actual codecs are
STUBBED with a clearly-marked deterministic fake (``_fake_decode``):
byte-length/byte-content arithmetic stands in for real pixel data.
The Spark-side contract — schemas, batching, partitioning, UDF
signatures — is real and tested; swapping in PIL/librosa/ffmpeg means
replacing only the marked function bodies.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

#: Arrow batch schema produced by image_features.
IMAGE_FEATURES_FIELDS = (
    "n_bytes int, width int, height int, mean_byte double, features array<float>"
)

FEATURE_DIM = 8


def _fake_decode(data: bytes) -> tuple[int, int, float, list[float]]:
    """=== DETERMINISTIC STUB — replace with a real image codec ===

    Derives pseudo width/height/intensity/features purely from the
    bytes so tests (and SQL oracles) can validate the plumbing:
      width  = n % 512 + 16
      height = (n * 31) % 512 + 16
      mean_byte = mean of the first 64 bytes
      features = normalized byte histogram over 8 buckets
    """
    n = len(data)
    width = n % 512 + 16
    height = (n * 31) % 512 + 16
    head = data[:64]
    mean_byte = (sum(head) / len(head)) if head else 0.0
    hist = [0] * FEATURE_DIM
    for b in data:
        hist[b % FEATURE_DIM] += 1
    total = max(n, 1)
    features = [h / total for h in hist]
    return width, height, mean_byte, features


def image_features(
    df: DataFrame,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Decode + featurize a binary image column. One Python pass over
    Arrow batches; upstream columns are pruned to ids + payload before
    the Python boundary so only necessary bytes cross it."""
    src = df.select(*id_cols, binary_col)
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in id_cols
    )
    out_schema = f"{id_schema}, {IMAGE_FEATURES_FIELDS}"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _fake_decode(bytes(b)) if b is not None else (None, None, None, None)
                for b in pdf[binary_col]
            ]
            out = pdf[list(id_cols)].copy()
            out["n_bytes"] = [
                len(bytes(b)) if b is not None else None for b in pdf[binary_col]
            ]
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["mean_byte"] = [d[2] for d in decoded]
            out["features"] = [d[3] for d in decoded]
            yield out

    return src.mapInPandas(decode_batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
    n_frames: int = 4,
) -> DataFrame:
    """Fake video frame sampling: splits the payload into n_frames
    equal chunks (STUB for real keyframe extraction); output is one
    row per (item, frame_idx) with the frame bytes — the row-explosion
    plumbing a real sampler needs."""
    src = df.select(*id_cols, binary_col)
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in id_cols
    )
    out_schema = f"{id_schema}, frame_idx int, frame binary, frame_bytes int"

    def split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[binary_col]) if row[binary_col] is not None else b""
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step]
                    rows.append(
                        {
                            **{c: row[c] for c in id_cols},
                            "frame_idx": i,
                            "frame": chunk,
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows)

    return src.mapInPandas(split_batches, schema=out_schema)


def audio_features(
    df: DataFrame,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Audio feature extraction placeholder. The decode step requires
    an audio codec not present in this environment."""
    raise NotImplementedError(
        "audio decode requires an audio library (e.g. librosa/soundfile) "
        "not available in this environment; the mapInPandas plumbing "
        "mirrors image_features — implement by replacing the codec body"
    )
