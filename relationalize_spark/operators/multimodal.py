"""Multimodal (image/audio/video) column plumbing.

Convention: media travels as an opaque ``binary`` column plus typed
metadata columns. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the right shape for per-item Python codecs at scale
(vectorized transfer, no per-row pickling, executor-parallel).

This container has no image codec libraries; what is real vs stubbed:

- REAL: ``decode_images`` / ``resize_images`` decode codec-free
  raster formats (binary netpbm P5/P6, uncompressed 24/32-bit BMP)
  plus baseline-sequential JPEG (r11 — the pure-numpy
  Huffman+IDCT decoder in :mod:`.jpeg`, so the RIFF walker's
  extracted keyframes become pixels in-container) and resize with
  pure-numpy bilinear/nearest sampling — actual pixels, no PIL.
  ``audio_features`` decodes PCM WAV via the stdlib ``wave``
  module. Payloads outside that envelope (PNG, progressive JPEG,
  MP3) yield NULL rather than failing the job.
- GUARDED-REAL (r5): ``image_features(decoder="auto")`` decodes with
  PIL when it is importable on the executors (``_pil_decode``), and
  ``sample_frames(mode="auto")`` extracts real keyframes via PyAV
  (``_av_keyframes``); neither library ships in this container, so
  here both fall back per-payload to the deterministic paths below —
  the library-present branches are exercised in tests through
  injected fake modules.
- STUB (clearly marked, also selectable explicitly for
  engine-replayable oracles): ``image_features``' ``_fake_decode``
  byte-arithmetic path (pinned by the driver query q35 via
  ``decoder="stub"``) and ``sample_frames``' chunk-split keyframe
  fake (``mode="chunk"``).

The Spark-side contract — schemas, Arrow batching, column pruning
before the Python boundary, executor parallelism — is identical for
real and stubbed paths and is what the tests pin.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def _pil_decode(Image, data: bytes) -> tuple[int, int, float, list[float]]:
    """Real compressed-image decode via PIL (guarded optional import —
    absent in this container, exercised in tests through an injected
    fake module): width/height from the codec, mean and 8-bucket
    normalized histogram over the grayscale pixels. Same output
    contract as :func:`_fake_decode`."""
    import io

    import numpy as np

    with Image.open(io.BytesIO(data)) as im:
        g = np.asarray(im.convert("L"), dtype=np.uint8)
    hist = np.bincount(g.ravel() >> 5, minlength=FEATURE_DIM)[:FEATURE_DIM]
    total = max(int(g.size), 1)
    return (
        int(g.shape[1]),
        int(g.shape[0]),
        float(g.mean()) if g.size else 0.0,
        (hist / total).astype(float).tolist(),
    )


def _load_pil():
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def image_features(
    df: DataFrame,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
    decoder: str = "auto",
) -> DataFrame:
    """Decode + featurize a binary image column. One Python pass over
    Arrow batches; upstream columns are pruned to ids + payload before
    the Python boundary so only necessary bytes cross it.

    ``decoder``: ``"auto"`` uses PIL when importable on the executors
    (real codec decode, per-payload fallback to the stub on corrupt
    bytes so rows never fail the job), ``"pil"`` requires it,
    ``"stub"`` pins the deterministic byte-derived geometry — the
    engine-replayable mode q35's SQL oracle replays."""
    if decoder not in ("auto", "pil", "stub"):
        raise ValueError(f"decoder must be auto|pil|stub, got {decoder!r}")
    src = df.select(*id_cols, binary_col)
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in id_cols
    )
    out_schema = f"{id_schema}, {IMAGE_FEATURES_FIELDS}"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _load_pil() if decoder in ("auto", "pil") else None
        if decoder == "pil" and Image is None:
            raise ImportError("decoder='pil' but PIL is not importable")

        def one(data: bytes):
            if Image is not None:
                try:
                    return _pil_decode(Image, data)
                except Exception:
                    return _fake_decode(data)  # corrupt payload: keep the row
            return _fake_decode(data)

        for pdf in batches:
            decoded = [
                one(bytes(b)) if b is not None else (None, None, None, None)
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


def _load_av():
    try:
        import av  # noqa: PLC0415

        return av
    except ImportError:
        return None


def _av_keyframes(av, data: bytes, n_frames: int) -> list[bytes]:
    """Real keyframe extraction via PyAV (guarded optional import —
    absent in this container; exercised in tests through an injected
    fake module): decode only keyframes (``skip_frame=NONKEY``) and
    return up to ``n_frames`` of them as raw RGB24 byte planes."""
    import io

    frames: list[bytes] = []
    with av.open(io.BytesIO(data)) as container:
        stream = container.streams.video[0]
        stream.codec_context.skip_frame = "NONKEY"
        for frame in container.decode(stream):
            frames.append(frame.to_ndarray(format="rgb24").tobytes())
            if len(frames) >= n_frames:
                break
    return frames


def _mjpeg_avi_frames(data: bytes, n_frames: int) -> list[bytes] | None:
    """Codec-free real video path (r8 verdict item 5, shipped r10):
    extract JPEG frames from an MJPEG-in-AVI payload by walking the
    RIFF chunk tree — no codec library, pure byte structure, the
    video analog of the netpbm/BMP image and PCM-WAV audio real
    paths. MJPEG stores every frame as a complete JPEG, so "first
    ``n_frames`` frames" IS the keyframe sample PyAV's
    ``skip_frame=NONKEY`` would take on this container.

    Returns the first ``n_frames`` video-chunk payloads (``##dc`` /
    ``##db`` stream chunks, collected ONLY when the LIST ancestry
    includes a ``movi`` — or its interleave grouping ``rec `` — list,
    matching real AVI structure; SOI/EOI-framed bytes planted in
    ``hdrl``/junk regions are ignored, r11 ADVICE) that are
    well-formed JPEGs (SOI ``FFD8`` ... EOI ``FFD9``), or
    ``None`` when the payload is not parseable RIFF-AVI or holds no
    such frames — the caller falls back to deterministic chunking.
    Truncated/garbage tails stop the walk instead of raising (media
    at corpus scale is always partially corrupt)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    riff_size = int.from_bytes(data[4:8], "little")
    frames: list[bytes] = []
    # explicit stack, NOT recursion: a crafted/corrupt payload of
    # thousands of nested LIST headers must stop the walk, never
    # raise RecursionError out of the executor task (r10 review —
    # confirmed by repro with a 24 KB nested-LIST payload). Real AVIs
    # nest 2-3 deep; 64 is silly-deep but still O(1) memory.
    stack: list[tuple[int, int, bool]] = [
        (12, min(8 + riff_size, len(data)), False)
    ]
    while stack and len(frames) < n_frames:
        off, end, in_movi = stack.pop()
        while off + 8 <= end and len(frames) < n_frames:
            fourcc = data[off : off + 4]
            size = int.from_bytes(data[off + 4 : off + 8], "little")
            body_start = off + 8
            body_end = min(body_start + size, end)
            if fourcc == b"LIST" and size >= 4 and len(stack) < 64:
                # resume the current level after the nested one
                stack.append((body_start + size + (size & 1), end, in_movi))
                list_type = data[body_start : body_start + 4]
                # frame chunks live only under movi (or its rec
                # interleave groupings, themselves inside movi —
                # inherited so either nesting order is tolerated)
                in_movi = in_movi or list_type in (b"movi", b"rec ")
                off, end = body_start + 4, body_end
                continue
            if in_movi and fourcc[2:4] in (b"dc", b"db") and size >= 4:
                payload = data[body_start:body_end]
                if payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9":
                    frames.append(payload)
            off = body_start + size + (size & 1)  # chunks pad to even
    return frames or None


def sample_frames(
    df: DataFrame,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
    n_frames: int = 4,
    mode: str = "auto",
) -> DataFrame:
    """Video frame sampling: one output row per (item, frame_idx)
    with the frame bytes — the row-explosion plumbing a real sampler
    needs.

    ``mode``: ``"auto"`` extracts real keyframes — via PyAV when it
    is importable on the executors, else via the codec-free
    MJPEG-in-AVI RIFF walk (:func:`_mjpeg_avi_frames` — REAL frames
    in this container, no libraries), per-payload fallback to
    chunking on undecodable bytes; ``"av"`` requires PyAV;
    ``"chunk"`` pins the deterministic stub (payload split into
    ``n_frames`` equal chunks — the engine-replayable mode)."""
    if mode not in ("auto", "av", "chunk"):
        raise ValueError(f"mode must be auto|av|chunk, got {mode!r}")
    src = df.select(*id_cols, binary_col)
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in id_cols
    )
    out_schema = f"{id_schema}, frame_idx int, frame binary, frame_bytes int"

    def split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        av = _load_av() if mode in ("auto", "av") else None
        if mode == "av" and av is None:
            raise ImportError("mode='av' but PyAV is not importable")

        def frames_of(data: bytes) -> list[bytes]:
            if av is not None:
                try:
                    got = _av_keyframes(av, data, n_frames)
                    if got:
                        return got
                except Exception:
                    pass  # undecodable payload: fall through
            if mode == "auto":
                try:
                    got = _mjpeg_avi_frames(data, n_frames)
                except Exception:
                    got = None  # corrupt container: fall through
                if got:
                    return got
            step = max(len(data) // n_frames, 1)
            return [data[i * step : (i + 1) * step] for i in range(n_frames)]

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[binary_col]) if row[binary_col] is not None else b""
                for i, chunk in enumerate(frames_of(data)):
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


#: Arrow batch schema produced by decode_images.
DECODED_IMAGE_FIELDS = (
    "n_bytes int, format string, height int, width int, channels int, "
    "channel_means array<double>"
)


def _decode_netpbm(data: bytes):
    """Real netpbm decode (binary P5 grayscale / P6 RGB, maxval<=255)
    in pure numpy — the uncompressed interchange format that needs no
    codec library. Returns (format, H, W, C, uint8 array HxWxC) or
    None if the payload is not parseable netpbm."""
    import numpy as np

    if len(data) < 2 or data[:2] not in (b"P5", b"P6"):
        return None
    # Header = magic, width, height, maxval as whitespace-separated
    # ASCII tokens; '#' comments run to end of line.
    tokens, i, n = [], 2, len(data)
    while len(tokens) < 3 and i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and not data[j : j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    if len(tokens) < 3:
        return None
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if not (0 < width and 0 < height and 0 < maxval <= 255):
        return None
    i += 1  # single whitespace byte after maxval, then raster
    channels = 3 if data[:2] == b"P6" else 1
    need = width * height * channels
    raster = data[i : i + need]
    if len(raster) != need:
        return None
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, channels)
    return ("ppm" if channels == 3 else "pgm", height, width, channels, arr)


def _decode_bmp(data: bytes):
    """Real uncompressed-BMP decode (BITMAPINFOHEADER, 24/32-bit,
    BI_RGB) in pure numpy. Rows are 4-byte aligned and stored
    bottom-up (negative height = top-down). Returns like
    :func:`_decode_netpbm` with channels ordered RGB."""
    import struct

    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        return None
    try:
        pixel_off = struct.unpack_from("<I", data, 10)[0]
        header_sz = struct.unpack_from("<I", data, 14)[0]
        if header_sz < 40:
            return None
        width, height_raw = struct.unpack_from("<ii", data, 18)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
    except struct.error:
        return None
    if planes != 1 or compression != 0 or bpp not in (24, 32) or width <= 0:
        return None
    height = abs(height_raw)
    bottom_up = height_raw > 0
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    need = stride * height
    raster = data[pixel_off : pixel_off + need]
    if len(raster) != need:
        return None
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(height, stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        px = px[::-1]
    rgb = px[:, :, 2::-1]  # stored BGR(A) -> RGB
    return ("bmp", height, width, 3, np.ascontiguousarray(rgb))


def decode_raster(data: bytes):
    """Dispatching real decoder: netpbm, BMP, then baseline JPEG
    (r11 — the pure-numpy decoder in :mod:`.jpeg`, closing the
    AVI → keyframes → pixels lane in-container); None when the
    payload needs a codec outside that envelope (PNG, progressive
    JPEG — swap in PIL here where available)."""
    got = _decode_netpbm(data) or _decode_bmp(data)
    if got is not None:
        return got
    if len(data) >= 2 and data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_baseline

        arr = decode_jpeg_baseline(data)
        if arr is not None:
            h, w, c = arr.shape
            return ("jpeg", h, w, c, arr)
    return None


def decode_images(
    df: DataFrame,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """REAL image decode + per-channel stats for codec-free formats
    (binary netpbm P5/P6, uncompressed 24/32-bit BMP, baseline JPEG)
    — pure numpy, no image library. Unparseable payloads yield NULL
    fields rather
    than failing the job. Same scale shape as image_features: columns
    pruned to ids + payload before the Arrow boundary, one Python
    pass, executor-parallel."""
    def row(data: bytes | None) -> dict:
        dec = decode_raster(data) if data is not None else None
        if dec is None:
            return {"n_bytes": len(data) if data is not None else None,
                    "format": None, "height": None, "width": None,
                    "channels": None, "channel_means": None}
        fmt, h, w, c, arr = dec
        return {"n_bytes": len(data), "format": fmt,
                "height": h, "width": w, "channels": c,
                "channel_means": [float(m) for m in
                                  arr.reshape(-1, c).mean(axis=0)]}

    return _per_payload_frame(
        df, binary_col, id_cols, DECODED_IMAGE_FIELDS, row
    )


def resize_raster(arr, out_h: int, out_w: int, method: str = "bilinear"):
    """Pure-numpy raster resize (HxWxC uint8 -> out_h x out_w x C).

    ``bilinear`` uses half-pixel-centered sampling (align_corners
    False — the OpenCV/PIL convention); ``nearest`` floors the same
    coordinates. Vectorized: two gathers + one fused multiply-add
    over the whole image, no Python pixel loop."""
    import numpy as np

    h, w = arr.shape[:2]
    if method == "nearest":
        ry = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int), h - 1)
        rx = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int), w - 1)
        return arr[ry][:, rx]
    if method != "bilinear":
        raise ValueError(f"unknown resize method: {method}")
    fy = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    fx = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(fy).astype(int)
    x0 = np.floor(fx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    a = arr.astype(np.float64)
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    return np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
    method: str = "bilinear",
) -> DataFrame:
    """Decode (netpbm/BMP/baseline-JPEG, real) + resize (pure-numpy
    bilinear or
    nearest) a binary image column; emits the resized raw raster
    (height*width*channels uint8 bytes, row-major RGB) plus dims so
    downstream featurizers can consume it without re-decoding.
    Undecodable payloads pass through with NULL raster."""
    src = df.select(*id_cols, binary_col)
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in id_cols
    )
    out_schema = (
        f"{id_schema}, format string, height int, width int, channels int, "
        f"raster binary"
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                ids = {c: pdf[c].iloc[idx] for c in id_cols}
                b = pdf[binary_col].iloc[idx]
                dec = decode_raster(bytes(b)) if b is not None else None
                if dec is None:
                    rows.append({**ids, "format": None, "height": None,
                                 "width": None, "channels": None, "raster": None})
                else:
                    fmt, _, _, c, arr = dec
                    out = resize_raster(arr, out_h, out_w, method)
                    rows.append({**ids, "format": fmt, "height": out_h,
                                 "width": out_w, "channels": c,
                                 "raster": out.tobytes()})
            yield pd.DataFrame(rows)

    return src.mapInPandas(resize_batches, schema=out_schema)


def luma_gray(arr):
    """HxWxC uint8 -> HxW int64 integer luma. 3-channel uses the
    BT.601 weights in EXACT integer form ((299R + 587G + 114B) //
    1000 — floor division, never a float round), so every downstream
    perceptual-hash bit is integer-deterministic and replayable in
    SQL; 1-channel is identity."""
    import numpy as np

    a = arr.astype(np.int64)
    if arr.shape[2] == 1:
        return a[:, :, 0]
    return (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000


def _pack_bits64(bits) -> int:
    """64 bools (bit j = index j) -> signed 64-bit int. Bit 63 lands
    as the -2^63 addend rather than 1<<63 so the SAME packing is
    expressible in SQL engines whose left shift refuses to overflow
    into the sign bit (DuckDB — the value oracle's form)."""
    sig = 0
    for j in range(63):
        if bits[j]:
            sig |= 1 << j
    if bits[63]:
        sig += -(2**63)
    return sig


def dhash64(arr) -> int:
    """Difference hash (dHash, the standard perceptual image
    near-dup fingerprint): integer luma -> nearest-resize to 9x8
    (one extra column) -> bit[y*8+x] = g[y,x] > g[y,x+1]. 64 bits of
    horizontal gradient sign — invariant to brightness/contrast
    scaling and JPEG requantization noise, which is exactly what a
    multimodal curation dedup wants. Every step is an integer gather
    or compare: bit-replayable anywhere."""
    g = luma_gray(arr)[:, :, None]
    r = resize_raster(g, 8, 9, method="nearest")[:, :, 0].astype("int64")
    bits = (r[:, :-1] > r[:, 1:]).reshape(-1)
    return _pack_bits64(bits)


def ahash64(arr) -> int:
    """Average hash: integer luma -> nearest-resize to 8x8 ->
    bit = pixel > mean, with the mean compare in exact integers
    (64*p > sum(p)) so no float mean can waver a boundary bit."""
    g = luma_gray(arr)[:, :, None]
    r = resize_raster(g, 8, 8, method="nearest")[:, :, 0].astype("int64")
    total = int(r.sum())
    bits = (64 * r > total).reshape(-1)
    return _pack_bits64(bits)


def dhash128(arr) -> tuple[int, int]:
    """128-bit dHash as TWO 64-bit lanes: nearest-resize the luma to
    16x9 and take :func:`dhash64`'s horizontal-gradient bits per
    8-row half (lane 1 = rows 0-7, lane 2 = rows 8-15 — finer
    VERTICAL resolution than dhash64, same horizontal). What the
    wide form buys, measured (r11, BASELINE.md): a finer DISTANCE
    scale — at 100x the coarse 64-bit hamming<=6 ball admitted 6x
    more pairs than the 128-bit ball on the same corpus (chance
    near-collisions, not near-dups) — plus wider band buckets
    (headroom for corpus sizes where chance candidates genuinely
    dominate). It is NOT a fix for degenerate buckets: a constant
    signature region floods one bucket at any lane width
    (de-correlate the signature, or cap with
    ``hamming_dup_pairs(max_bucket=...)``). Distance over 128 bits
    with the same ``max_hamming`` halves the tolerated fractional
    disagreement — the simhash 64->128 semantic switch,
    deliberate."""
    g = luma_gray(arr)[:, :, None]
    r = resize_raster(g, 16, 9, method="nearest")[:, :, 0].astype("int64")
    bits = (r[:, :-1] > r[:, 1:]).reshape(-1)  # 16*8 = 128 bits
    return _pack_bits64(bits[:64]), _pack_bits64(bits[64:])


def _per_payload_frame(
    df: DataFrame,
    binary_col: str,
    id_cols: tuple[str, ...],
    out_fields: str,
    row_fn,
) -> DataFrame:
    """The shared per-payload mapInPandas shape (r11 review: this
    loop was hand-copied into every modality lane): ids + payload
    pruned before the Arrow boundary, one executor-parallel Python
    pass, ``row_fn(payload_bytes_or_None) -> dict`` supplying the
    non-id output fields. Any contract fix (NULL handling, batch
    shape) lands HERE once."""
    src = df.select(*id_cols, binary_col)
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in id_cols
    )
    out_schema = f"{id_schema}, {out_fields}"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for idx in range(len(pdf)):
                ids = {c: pdf[c].iloc[idx] for c in id_cols}
                b = pdf[binary_col].iloc[idx]
                rows.append(
                    {**ids, **row_fn(bytes(b) if b is not None else None)}
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(batches, schema=out_schema)


def image_signatures(
    df: DataFrame,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
    kind: str = "dhash",
) -> DataFrame:
    """Perceptual 64-bit signature per image (r11 — VERDICT r10 item
    5): decode via :func:`decode_raster` (netpbm/BMP/baseline-JPEG,
    real pixels in-container), then :func:`dhash64` or
    :func:`ahash64`. Undecodable payloads yield NULL sig. Same scale
    shape as decode_images: ids+payload pruned before the Arrow
    boundary, one executor-parallel Python pass, numpy-vectorized
    per image. Feed the output to
    :func:`relationalize_spark.operators.dedup.hamming_dup_pairs`
    (or use :func:`image_dup_pairs`)."""
    if kind not in ("dhash", "ahash", "dhash128"):
        raise ValueError(f"kind must be dhash|ahash|dhash128, got {kind!r}")
    two_lane = kind == "dhash128"
    hash_fn = {"dhash": dhash64, "ahash": ahash64, "dhash128": dhash128}[kind]

    def row(data: bytes | None) -> dict:
        dec = decode_raster(data) if data is not None else None
        if two_lane:
            s = hash_fn(dec[4]) if dec else (None, None)
            return {"sig": s[0], "sig2": s[1]}
        return {"sig": hash_fn(dec[4]) if dec else None}

    return _per_payload_frame(
        df,
        binary_col,
        id_cols,
        "sig long" + (", sig2 long" if two_lane else ""),
        row,
    )


def image_dup_pairs(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bands: int = 8,
    kind: str = "dhash",
    max_bucket: int | None = None,
) -> DataFrame:
    """Perceptual image near-dup pairs: decode -> dHash/aHash ->
    banded Hamming self-join (the SimHash pigeonhole machinery,
    factored as ``dedup.hamming_dup_pairs``). Default Hamming radius
    6/64 with 8 bands — pigeonhole needs only max_hamming+1 = 7, but
    the implementation requires bands to divide the per-lane 64
    bits, so 8 is the practical minimum here — the conventional
    dHash near-dup band. Undecodable images drop out (no NULL
    buckets). One shuffle to band buckets; candidates bounded by
    bucket cooccurrence, never O(N^2). Scale guidance (measured r11,
    BASELINE.md): the join's enemy is bucket DEGENERACY — a shared
    constant image region floods one bucket and melts the join at
    any signature width (guard with ``max_bucket`` via
    ``hamming_dup_pairs``, or de-correlate the pixels); for large
    corpora prefer ``kind="dhash128"`` for its stricter distance
    scale (6x fewer chance pairs at 100x here) and wider buckets."""
    from .dedup import hamming_dup_pairs

    sigs = image_signatures(
        df, binary_col=binary_col, id_cols=(id_col,), kind=kind
    ).where(F.col("sig").isNotNull())
    return hamming_dup_pairs(
        sigs,
        id_col=id_col,
        sig_col=("sig", "sig2") if kind == "dhash128" else "sig",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket=max_bucket,
    )


def _wav_int_samples(data: bytes):
    """PCM WAV -> exact int64 mono samples (channels SUMMED, not
    float-averaged, so every downstream energy stat is exact integer
    arithmetic), or None outside the PCM envelope. The integer twin
    of :func:`_decode_wav_pcm` for the fingerprint lane."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(data)) as w:
            channels = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        # inside the try: a TRUNCATED stream parses through wave but
        # returns an odd-length buffer, and frombuffer raising out
        # of here would fail the Spark task instead of yielding the
        # contractual NULL sig (r11 review — reproduced)
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        elif width == 1:
            x = np.frombuffer(raw, dtype="u1").astype(np.int64) - 128
        elif width == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.int64)
        else:
            return None
    except Exception:
        return None
    if channels > 1 and x.size % channels == 0:
        x = x.reshape(-1, channels).sum(axis=1)
    return x


def ehash64(samples) -> int | None:
    """64-bit audio energy-gradient fingerprint — the PCM analog of
    :func:`dhash64`: split the mono int stream into 65 equal-length
    windows (bounds ``floor(k*n/65)``), window energy = exact int64
    sum of |sample|, bit j = E_j > E_{j+1}. Invariant to POSITIVE
    GAIN exactly (scaling every sample by c > 0 scales every window
    energy by c, preserving each strict compare and each tie — no
    float ever enters), robust to requantization noise the way
    gradient signs are; NOT invariant to resampling or time shifts
    (window grid moves). Streams shorter than 65 samples return
    None. Feed to ``dedup.hamming_dup_pairs`` via
    :func:`audio_signatures` / :func:`audio_dup_pairs`."""
    import numpy as np

    n = int(samples.size)
    if n < 65:
        return None
    bounds = (np.arange(66, dtype=np.int64) * n) // 65
    mags = np.abs(samples)
    csum = np.concatenate(([0], np.cumsum(mags)))
    energy = csum[bounds[1:]] - csum[bounds[:-1]]
    bits = energy[:-1] > energy[1:]
    return _pack_bits64(bits)


def audio_signatures(
    df: DataFrame,
    binary_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-payload 64-bit audio fingerprint (:func:`ehash64` over the
    real stdlib PCM decode). Undecodable or too-short payloads yield
    NULL sig. Same Arrow shape as image_signatures."""

    def row(data: bytes | None) -> dict:
        x = _wav_int_samples(data) if data is not None else None
        return {"sig": ehash64(x) if x is not None else None}

    return _per_payload_frame(df, binary_col, id_cols, "sig long", row)


def audio_dup_pairs(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bands: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Audio near-dup pairs: PCM decode -> energy-gradient
    fingerprint -> banded Hamming self-join — re-gained and
    requantized copies of the same recording collapse (the gain
    invariance is EXACT, see :func:`ehash64`). Same machinery,
    same scale shape, and same degenerate-bucket guidance as
    :func:`image_dup_pairs` (silence is audio's solid-color frame:
    all-zero energies tie every compare to sig 0 — cap with
    ``max_bucket`` on silence-heavy corpora or trim silence
    upstream)."""
    from .dedup import hamming_dup_pairs

    sigs = audio_signatures(
        df, binary_col=binary_col, id_cols=(id_col,)
    ).where(F.col("sig").isNotNull())
    return hamming_dup_pairs(
        sigs, id_col=id_col, sig_col="sig",
        max_hamming=max_hamming, bands=bands, max_bucket=max_bucket,
    )


def video_dup_pairs(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    n_frames: int = 4,
    max_hamming: int = 6,
    bands: int = 8,
    kind: str = "dhash",
    min_matches: int = 1,
    mode: str = "auto",
    max_bucket: int | None = None,
) -> DataFrame:
    """Video-level near-dup pairs by keyframe perceptual hashing —
    the whole r10/r11 multimodal lane composed end to end: RIFF-walk
    keyframe extraction (:func:`sample_frames`), in-container JPEG
    decode (:mod:`.jpeg`), dHash signatures
    (:func:`image_signatures`), banded Hamming join
    (``dedup.hamming_dup_pairs``), then aggregation to video pairs.
    Two videos pair when at least ``min_matches`` of EACH side's
    sampled keyframes participate in a cross-video match within
    ``max_hamming`` — the standard re-encode/re-container dedup for
    video corpora (dHash survives requantization; the keyframe
    SAMPLE survives trims at the match-count level).
    ``n_frame_matches`` counts DISTINCT matched keyframes on the
    sparser side (min over the two sides), NOT matched frame pairs —
    a still/slideshow whose near-identical frames all hit one shared
    intro card would inflate a pair count quadratically and defeat
    the threshold (r11 review).

    Output: ``(i, j, n_frame_matches, min_hamming)`` with ``i < j``.

    Scale shape: frames explode bounded by ``n_frames`` per video;
    one Arrow pass decodes+hashes; the banded join is
    bucket-bounded (same machinery and same degeneracy guidance as
    :func:`image_dup_pairs` — solid-color intro/outro frames are a
    classic degenerate bucket, cap with ``hamming_dup_pairs``'s
    ``max_bucket`` when corpora carry them); the final aggregation
    shuffles only matched FRAME pairs. Frame identity inside the
    join is ``xxhash64(id, frame_idx)`` (the video id rides along as
    a keep_col), so within-video matches are dropped exactly and
    the pair orientation is normalized to video-id order."""
    from .dedup import hamming_dup_pairs

    frames = sample_frames(
        df,
        binary_col=binary_col,
        id_cols=(id_col,),
        n_frames=n_frames,
        mode=mode,
    )
    sigs = image_signatures(
        frames, binary_col="frame", id_cols=(id_col, "frame_idx"), kind=kind
    )
    lanes = ("sig", "sig2") if kind == "dhash128" else ("sig",)
    sigs = sigs.where(F.col("sig").isNotNull()).withColumn(
        "__fid__", F.xxhash64(F.col(id_col), F.col("frame_idx"))
    )
    fp = hamming_dup_pairs(
        sigs,
        id_col="__fid__",
        sig_col=lanes if len(lanes) > 1 else lanes[0],
        max_hamming=max_hamming,
        bands=bands,
        keep_cols=(id_col, "frame_idx"),
        max_bucket=max_bucket,
    )
    vi, vj = F.col(f"i_{id_col}"), F.col(f"j_{id_col}")
    # orient each matched frame pair to video-id order, keeping WHICH
    # frame belongs to which side, so the evidence count is distinct
    # keyframes per side
    fi = F.when(vi < vj, F.col("i_frame_idx")).otherwise(
        F.col("j_frame_idx")
    )
    fj = F.when(vi < vj, F.col("j_frame_idx")).otherwise(
        F.col("i_frame_idx")
    )
    return (
        fp.where(vi != vj)
        .select(
            F.least(vi, vj).alias("i"),
            F.greatest(vi, vj).alias("j"),
            fi.alias("__fi__"),
            fj.alias("__fj__"),
            "hamming",
        )
        .groupBy("i", "j")
        .agg(
            F.least(
                F.count_distinct(F.col("__fi__")),
                F.count_distinct(F.col("__fj__")),
            ).alias("n_frame_matches"),
            F.min("hamming").alias("min_hamming"),
        )
        .where(F.col("n_frame_matches") >= min_matches)
    )


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
        # inside the try: truncated streams hand frombuffer an
        # odd-length buffer (r11 review — the same crash fixed in
        # _wav_int_samples; decode failures must be None, not task
        # failures)
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
        elif width == 1:
            x = (
                np.frombuffer(raw, dtype="u1").astype("float64") - 128.0
            ) / 128.0
        elif width == 4:
            x = (
                np.frombuffer(raw, dtype="<i4").astype("float64")
                / 2147483648.0
            )
        else:
            return None
    except Exception:
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

    def row(data: bytes | None) -> dict:
        decoded = _decode_wav_pcm(data) if data is not None else None
        if decoded is None:
            return {"n_bytes": len(data) if data is not None else None,
                    "sample_rate": None, "n_channels": None,
                    "n_samples": None, "duration_s": None,
                    "rms": None, "zero_crossing_rate": None}
        rate, channels, n_samples, rms, zcr = decoded
        return {"n_bytes": len(data),
                "sample_rate": rate, "n_channels": channels,
                "n_samples": n_samples,
                "duration_s": (n_samples / rate) if rate else None,
                "rms": rms, "zero_crossing_rate": zcr}

    return _per_payload_frame(
        df, binary_col, id_cols, AUDIO_FEATURES_FIELDS, row
    )
