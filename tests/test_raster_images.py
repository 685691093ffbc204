"""Real (codec-free) image path: netpbm/BMP decode and pure-numpy
resize, exercised both directly and through the Arrow-batched Spark
operators. Payloads are synthesized byte-exact in-test, so every
assertion is against ground-truth pixels."""

import struct

import numpy as np
import pytest

from relationalize_spark.operators.multimodal import (
    decode_images,
    decode_raster,
    resize_images,
    resize_raster,
)


def make_ppm(arr: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = arr.shape
    hdr = b"P6\n" + (b"# synthetic\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    return hdr + arr.tobytes()


def make_pgm(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return f"P5 {w} {h} 255\n".encode() + arr.tobytes()


def make_bmp(arr: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    """Minimal BITMAPINFOHEADER BMP from an HxWx3 RGB array."""
    h, w, _ = arr.shape
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    rows = []
    order = arr if top_down else arr[::-1]
    for r in order:
        if bpp == 24:
            row = r[:, ::-1].tobytes()  # RGB -> BGR
        else:
            row = np.concatenate(
                [r[:, ::-1], np.full((w, 1), 255, np.uint8)], axis=1
            ).tobytes()  # BGRA
        rows.append(row + b"\0" * (stride - len(row)))
    raster = b"".join(rows)
    height_field = -h if top_down else h
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, height_field, 1, bpp, 0, len(raster), 2835, 2835, 0, 0
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    return file_hdr + info + raster


@pytest.fixture
def rgb():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)


def test_ppm_decode_roundtrip(rgb):
    fmt, h, w, c, arr = decode_raster(make_ppm(rgb, comment=True))
    assert (fmt, h, w, c) == ("ppm", 5, 7, 3)
    assert np.array_equal(arr, rgb)


def test_pgm_decode_roundtrip():
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    fmt, h, w, c, arr = decode_raster(make_pgm(g))
    assert (fmt, h, w, c) == ("pgm", 4, 6, 1)
    assert np.array_equal(arr[:, :, 0], g)


@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_decode_roundtrip(rgb, bpp, top_down):
    fmt, h, w, c, arr = decode_raster(make_bmp(rgb, bpp=bpp, top_down=top_down))
    assert (fmt, h, w, c) == ("bmp", 5, 7, 3)
    assert np.array_equal(arr, rgb)


def test_garbage_yields_none():
    assert decode_raster(b"\x89PNG\r\n\x1a\nnot really") is None
    assert decode_raster(b"P6 3 3 255") is None  # truncated raster
    assert decode_raster(b"BM" + b"\0" * 20) is None


def test_resize_identity_is_exact(rgb):
    assert np.array_equal(resize_raster(rgb, 5, 7, "bilinear"), rgb)
    assert np.array_equal(resize_raster(rgb, 5, 7, "nearest"), rgb)


def test_resize_downscale_2x_exact_average():
    # 2x2 blocks of constant color: half-pixel-centered bilinear at
    # exactly 2x downscale samples each block center -> block value.
    block = np.repeat(np.repeat(np.arange(4, dtype=np.uint8).reshape(2, 2) * 60, 2, 0), 2, 1)
    arr = np.stack([block] * 3, axis=2)
    out = resize_raster(arr, 2, 2, "bilinear")
    assert np.array_equal(out[:, :, 0], np.array([[0, 60], [120, 180]], np.uint8))


def test_resize_upscale_nearest_repeats_pixels():
    arr = np.array([[[0, 0, 0], [255, 255, 255]]], dtype=np.uint8)  # 1x2
    out = resize_raster(arr, 2, 4, "nearest")
    assert out.shape == (2, 4, 3)
    assert np.array_equal(out[:, :2], np.zeros((2, 2, 3), np.uint8))
    assert np.array_equal(out[:, 2:], np.full((2, 2, 3), 255, np.uint8))


def test_spark_decode_and_resize(spark, rgb):
    payloads = [
        ("ppm1", make_ppm(rgb)),
        ("bmp1", make_bmp(rgb)),
        ("bad1", b"JFIF-ish garbage"),
        ("null1", None),
    ]
    df = spark.createDataFrame(payloads, "doc_id string, content binary")

    dec = {r.doc_id: r for r in decode_images(df).collect()}
    assert dec["ppm1"].format == "ppm" and dec["bmp1"].format == "bmp"
    assert (dec["ppm1"].height, dec["ppm1"].width, dec["ppm1"].channels) == (5, 7, 3)
    expected_means = rgb.reshape(-1, 3).mean(axis=0)
    for name in ("ppm1", "bmp1"):
        assert np.allclose(dec[name].channel_means, expected_means)
    assert dec["bad1"].format is None and dec["bad1"].n_bytes == 16
    assert dec["null1"].format is None and dec["null1"].n_bytes is None

    rez = {r.doc_id: r for r in resize_images(df, 3, 4).collect()}
    ref = resize_raster(rgb, 3, 4, "bilinear")
    for name in ("ppm1", "bmp1"):
        assert (rez[name].height, rez[name].width) == (3, 4)
        got = np.frombuffer(bytes(rez[name].raster), np.uint8).reshape(3, 4, 3)
        assert np.array_equal(got, ref)
    assert rez["bad1"].raster is None
