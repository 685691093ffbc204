"""Perceptual image near-dup (r11 — VERDICT r10 item 5):
dHash/aHash over the real decoded-pixel path + banded Hamming join
(dedup.hamming_dup_pairs, the SimHash pigeonhole machinery factored
out). All-integer pipeline — expectations are analytic."""

import numpy as np
import pytest

from relationalize_spark.operators.dedup import hamming_dup_pairs
from relationalize_spark.operators.multimodal import (
    ahash64,
    dhash64,
    image_dup_pairs,
    image_signatures,
    luma_gray,
)


def _p5(arr2d) -> bytes:
    """Binary netpbm P5 from an HxW uint8 array."""
    h, w = arr2d.shape
    return f"P5 {w} {h} 255\n".encode() + arr2d.astype(np.uint8).tobytes()


def _img(arr2d):
    return np.asarray(arr2d, dtype=np.uint8)[:, :, None]


def test_luma_gray_exact_integer():
    rgb = np.zeros((1, 2, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0)
    rgb[0, 1] = (10, 20, 30)
    g = luma_gray(rgb)
    assert g[0, 0] == (299 * 255) // 1000 == 76
    assert g[0, 1] == (299 * 10 + 587 * 20 + 114 * 30) // 1000 == 18
    gray = np.array([[7, 200]], dtype=np.uint8)[:, :, None]
    assert (luma_gray(gray) == [[7, 200]]).all()


def test_dhash_analytic_extremes():
    # strictly decreasing rows: every left pixel > right -> all 64
    # bits set -> signed -1 (bit 63 via the -2^63 addend)
    desc = np.tile(np.arange(100, 91, -1, dtype=np.uint8), (8, 1))
    assert dhash64(_img(desc)) == -1
    # non-decreasing -> no bit set
    asc = np.tile(np.arange(9, dtype=np.uint8), (8, 1))
    assert dhash64(_img(asc)) == 0
    flat = np.full((8, 9), 42, dtype=np.uint8)
    assert dhash64(_img(flat)) == 0


def test_dhash_sign_bit_exact():
    # only the LAST comparison (y=7, x=7 vs x=8) fires -> bit 63
    # alone -> exactly -2^63
    a = np.zeros((8, 9), dtype=np.uint8)
    a[7, 7] = 10  # > a[7, 8] = 0; all other adjacent pairs equal
    assert dhash64(_img(a)) == -(2**63)
    # only bit 0: y=0, x=0 > x=1
    b = np.zeros((8, 9), dtype=np.uint8)
    b[0, 0] = 10
    assert dhash64(_img(b)) == 1


def test_dhash_brightness_invariance():
    rng = np.random.RandomState(7)
    base = rng.randint(40, 180, size=(8, 9)).astype(np.uint8)
    brighter = (base.astype(np.int64) + 50).clip(0, 255).astype(np.uint8)
    assert dhash64(_img(base)) == dhash64(_img(brighter))


def test_ahash_analytic():
    # left half 200, right half 0: mean 100 -> exactly the left 32
    # bits set (columns 0-3 of each row)
    a = np.zeros((8, 8), dtype=np.uint8)
    a[:, :4] = 200
    sig = ahash64(_img(a))
    want = 0
    for y in range(8):
        for x in range(4):
            j = y * 8 + x
            want += -(2**63) if j == 63 else (1 << j)
    assert sig == want
    # integer mean boundary: pixel == mean is NOT above it
    flat = np.full((8, 8), 9, dtype=np.uint8)
    assert ahash64(_img(flat)) == 0


def test_dhash_resize_path():
    # a 90x80 image that nearest-downsamples to the 9x8 gradient:
    # block-constant 10x10 tiles, descending left->right
    tiles = np.tile(np.arange(100, 91, -1, dtype=np.uint8), (10, 1))
    big = np.kron(tiles, np.ones((8, 10), dtype=np.uint8))
    assert big.shape == (80, 90)
    assert dhash64(_img(big)) == -1


def test_hamming_dup_pairs_sign_safe_buckets(spark):
    # signatures differing ONLY in the top band (incl. the sign bit)
    # still collide on the three low bands; distance 2 found.
    s1 = -(2**63)  # bit 63
    s2 = -(2**63) + (1 << 62) + (1 << 61)  # bits 63, 62, 61
    far = 0x0F0F0F0F0F0F0F0F  # everywhere different
    df = spark.createDataFrame(
        [(1, s1), (2, s2), (3, far)], "id long, sig long"
    )
    got = {
        (r.i, r.j, r.hamming)
        for r in hamming_dup_pairs(df, max_hamming=3, bands=4).collect()
    }
    assert got == {(1, 2, 2)}


def test_hamming_dup_pairs_pigeonhole_recall_is_total(spark):
    """Brute-force equivalence on a corpus with planted near-dups:
    banded join output == the exact Hamming-ball pair set (recall 1
    by pigeonhole, precision 1 by the bit_count verify)."""
    rng = np.random.RandomState(11)
    sigs = []
    base = int(rng.randint(0, 2**62))
    for i in range(30):
        if i % 3 == 0:
            v = base ^ sum(
                1 << int(b) for b in rng.choice(63, rng.randint(0, 4), replace=False)
            )
        else:
            v = int(rng.randint(0, 2**62))
        sigs.append((i, v))
    df = spark.createDataFrame(sigs, "id long, sig long")
    got = {
        (r.i, r.j, r.hamming)
        for r in hamming_dup_pairs(df, max_hamming=6, bands=8).collect()
    }
    want = set()
    for i, si in sigs:
        for j, sj in sigs:
            if i < j and bin((si ^ sj) & (2**64 - 1)).count("1") <= 6:
                want.add((i, j, bin((si ^ sj) & (2**64 - 1)).count("1")))
    assert got == want and want  # non-trivial by construction


def test_hamming_dup_pairs_keep_cols(spark):
    df = spark.createDataFrame(
        [(1, 5, "a"), (2, 7, "b")], "id long, sig long, src string"
    )
    rows = hamming_dup_pairs(
        df, max_hamming=3, bands=4, keep_cols=("src",)
    ).collect()
    assert [(r.i, r.j, r.hamming, r.i_src, r.j_src) for r in rows] == [
        (1, 2, 1, "a", "b")
    ]


def test_image_signatures_and_pairs_end_to_end(spark):
    """netpbm + JPEG payloads through the REAL decode path: a
    one-pixel-tweaked twin pairs with its original; an unrelated
    image does not; garbage yields NULL sig and drops out of pairs."""
    rng = np.random.RandomState(3)
    a = rng.randint(0, 256, size=(8, 9)).astype(np.uint8)
    a2 = a.copy()
    a2[4, 4] = (int(a2[4, 4]) + 120) % 256  # flips a couple of bits
    b = rng.randint(0, 256, size=(8, 9)).astype(np.uint8)
    d_a, d_a2, d_b = dhash64(_img(a)), dhash64(_img(a2)), dhash64(_img(b))
    ham = bin((d_a ^ d_a2) & (2**64 - 1)).count("1")
    assert 0 < ham <= 6  # the tweak is visible but small
    assert bin((d_a ^ d_b) & (2**64 - 1)).count("1") > 6

    df = spark.createDataFrame(
        [
            (1, bytearray(_p5(a))),
            (2, bytearray(_p5(a2))),
            (3, bytearray(_p5(b))),
            (4, bytearray(b"not an image")),
        ],
        "doc_id long, content binary",
    )
    sigs = {r.doc_id: r.sig for r in image_signatures(df).collect()}
    assert sigs == {1: d_a, 2: d_a2, 3: d_b, 4: None}
    pairs = {(r.i, r.j) for r in image_dup_pairs(df).collect()}
    assert pairs == {(1, 2)}
    # ahash lane works through the same plumbing
    asigs = image_signatures(df, kind="ahash").collect()
    assert {r.doc_id for r in asigs if r.sig is not None} == {1, 2, 3}
    with pytest.raises(ValueError):
        image_signatures(df, kind="phash")


def test_image_signatures_jpeg_payload(spark):
    """The decoded-JPEG lane feeds the perceptual hash: a flat JPEG
    and the identical flat netpbm produce the SAME signature (both
    decode to the same pixels; dhash of flat = 0)."""
    import sys

    sys.path.insert(0, "tests")
    from test_jpeg_decode import _gray, encode_jpeg

    jpg = encode_jpeg(_gray([[80] + [0] * 63], 8, 8), [(1, 1)], [1] * 64)
    flat = np.full((8, 8), 138, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(jpg)), (2, bytearray(_p5(flat)))],
        "doc_id long, content binary",
    )
    sigs = {r.doc_id: r.sig for r in image_signatures(df).collect()}
    assert sigs[1] == sigs[2] == 0
