"""End-to-end media pipeline: files on disk -> binaryFile scan ->
real decode/resize/audio features -> typed parquet outputs."""

import io
import struct
import wave

import numpy as np

from examples.media_pipeline import run


def _ppm(arr):
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def _bmp(arr):
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = b"".join(
        r[:, ::-1].tobytes() + b"\0" * (stride - w * 3) for r in arr[::-1]
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54) + info + rows


def _wav(freq=440, rate=8000, n=800):
    x = (np.sin(2 * np.pi * freq * np.arange(n) / rate) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_media_pipeline_end_to_end(spark, tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    media = tmp_path / "media"
    media.mkdir()
    (media / "a.ppm").write_bytes(_ppm(arr))
    (media / "b.bmp").write_bytes(_bmp(arr))
    (media / "broken.ppm").write_bytes(b"P6 garbage header")
    (media / "tone.wav").write_bytes(_wav())
    (media / "notes.txt").write_bytes(b"ignored entirely")

    out = tmp_path / "out"
    counts = run(spark, str(media), str(out), target_hw=(4, 5))
    assert counts == {"images_ok": 2, "images_rejected": 1, "rasters": 2, "audio": 1}

    rasters = spark.read.parquet(str(out / "image_rasters")).collect()
    assert all(
        (r.height, r.width) == (4, 5) and len(bytes(r.raster)) == 4 * 5 * 3
        for r in rasters
    )
    af = spark.read.parquet(str(out / "audio_features")).first()
    assert af.sample_rate == 8000 and af.n_samples == 800 and af.rms > 0.1
