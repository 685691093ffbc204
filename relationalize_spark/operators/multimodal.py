"""Multimodal (image/audio/video) column plumbing.

Convention: media travels as an opaque ``binary`` column plus typed
metadata columns. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the right shape for per-item Python codecs at scale
(vectorized transfer, no per-row pickling, executor-parallel).

This container has no image libraries, so the image/video codecs are
STUBBED with a clearly-marked deterministic fake (``_fake_decode``):
byte-length/byte-content arithmetic stands in for real pixel data.
``audio_features`` decodes PCM WAV for real via the stdlib ``wave``
module (no external codec needed); compressed audio yields NULL
features. The Spark-side contract — schemas, batching, partitioning,
UDF signatures — is real and tested; swapping in PIL/ffmpeg means
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


#: Arrow batch schema produced by audio_features.
AUDIO_FEATURES_FIELDS = (
    "n_bytes int, sample_rate int, n_channels int, n_samples int, "
    "duration_s double, rms double, zero_crossing_rate double"
)


def _decode_wav_pcm(data: bytes):
    """Real PCM WAV decode via the stdlib ``wave`` module + numpy —
    no external codec needed. Returns (sample_rate, n_channels,
    n_samples, rms, zero_crossing_rate) or None when the payload is
    not a parseable PCM WAV (compressed formats need a real codec:
    swap this body for soundfile/librosa where available)."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(data)) as w:
            rate = w.getframerate()
            channels = w.getnchannels()
            width = w.getsampwidth()
            n = w.getnframes()
            raw = w.readframes(n)
    except Exception:
        return None
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype="u1").astype("float64") - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype("float64") / 2147483648.0
    else:
        return None
    if channels > 1 and x.size % channels == 0:
        x = x.reshape(-1, channels).mean(axis=1)  # downmix to mono
    if x.size == 0:
        return rate, channels, 0, 0.0, 0.0
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return rate, channels, int(x.size), rms, zcr


def audio_features(
    df: DataFrame,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Decode + featurize a binary audio column (PCM WAV via the
    stdlib codec; other formats yield NULL features rather than
    failing the job — the production pattern for dirty corpora).
    Same Arrow-batched mapInPandas shape as image_features: columns
    pruned to ids + payload before the Python boundary."""
    src = df.select(*id_cols, binary_col)
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in id_cols
    )
    out_schema = f"{id_schema}, {AUDIO_FEATURES_FIELDS}"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                ids = {c: pdf[c].iloc[idx] for c in id_cols}
                b = pdf[binary_col].iloc[idx]
                data = bytes(b) if b is not None else None
                decoded = _decode_wav_pcm(data) if data is not None else None
                if decoded is None:
                    rows.append({**ids, "n_bytes": len(data) if data is not None else None,
                                 "sample_rate": None, "n_channels": None,
                                 "n_samples": None, "duration_s": None,
                                 "rms": None, "zero_crossing_rate": None})
                else:
                    rate, channels, n_samples, rms, zcr = decoded
                    rows.append({**ids, "n_bytes": len(data),
                                 "sample_rate": rate, "n_channels": channels,
                                 "n_samples": n_samples,
                                 "duration_s": (n_samples / rate) if rate else None,
                                 "rms": rms, "zero_crossing_rate": zcr})
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode_batches, schema=out_schema)
