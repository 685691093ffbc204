"""Pure-numpy baseline JPEG decoder (operators/jpeg.py, r11 —
VERDICT r10 item 4).

Byte-exact synthesized-payload discipline (like test_raster_images
and the AVI walker tests): the encoder below is written from the
T.81 spec IN THE TEST, with its own zigzag table and its own Huffman
code assignment, so agreement with the decoder is two independent
derivations of the format meeting — not the decoder reading its own
handwriting. Expected pixel values are computed analytically (exact
IDCT identities for DC-only blocks) or by an independent float IDCT
built here from the textbook definition.
"""

import struct

import numpy as np
import pytest

from relationalize_spark.operators.jpeg import decode_jpeg_baseline

# --- independent zigzag (derived by walking diagonals, not copied) --


def _zigzag_pairs():
    order = []
    r = c = 0
    up = True
    for _ in range(64):
        order.append((r, c))
        if up:
            if c == 7:
                r += 1
                up = False
            elif r == 0:
                c += 1
                up = False
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
                up = True
            elif c == 0:
                r += 1
                up = True
            else:
                r += 1
                c -= 1
    return order


_ZZ_PAIRS = _zigzag_pairs()


def _idct_ref(coef8x8):
    """Textbook orthonormal 2-D IDCT, written independently."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv / 4.0 * coef8x8[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s
    return out


# --- minimal spec-faithful encoder (test-local) ---------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill
        return bytes(self.out)


# Flat canonical tables: every symbol gets an 8-bit code in value
# order — trivially prefix-free, nothing shared with the decoder's
# min/max-code machinery beyond the format itself.
def _flat_table(symbols):
    bits = [0] * 16
    bits[7] = len(symbols)  # all codes length 8
    codes = {s: i for i, s in enumerate(symbols)}
    return bits, list(symbols), codes, 8


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _dht(tc, th, bits, values):
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt(tq, table64):
    body = bytes([tq]) + bytes(int(x) for x in table64)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _category(v):
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t


def _enc_coef(w, codes, clen, run_size, v):
    w.put(codes[run_size], clen)
    t = run_size & 0x0F
    if t:
        w.put(v if v >= 0 else v + (1 << t) - 1, t)


def encode_jpeg(planes, sampling, quant, restart=0):
    """planes: list of dicts {(by,bx) per MCU index -> zigzag coef
    list}; simpler: list of [blocks-in-scan-order per component],
    where each block is a 64-list of QUANTIZED zigzag coefficients.
    sampling: [(h, v)] per component. quant: 64-list (table 0, used
    by all components). Grayscale when len == 1, else YCbCr."""
    ncomp = len(planes)
    height, width = planes[0]["size"]
    dc_bits, dc_vals, dc_codes, dc_len = _flat_table(_DC_SYMS)
    ac_bits, ac_vals, ac_codes, ac_len = _flat_table(_AC_SYMS)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, quant)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for ci in range(ncomp):
        h, v = sampling[ci]
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, dc_bits, dc_vals)
    out += _dht(1, 0, ac_bits, ac_vals)
    if restart:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    mcu_count = len(planes[0]["blocks"]) // (
        sampling[0][0] * sampling[0][1]
    )
    w = _BitWriter()
    pred = [0] * ncomp
    emitted = bytearray()
    for m in range(mcu_count):
        if restart and m and m % restart == 0:
            emitted += w.flush()
            emitted += bytes([0xFF, 0xD0 + ((m // restart - 1) % 8)])
            w = _BitWriter()
            pred = [0] * ncomp
        for ci in range(ncomp):
            h, v = sampling[ci]
            for b in range(h * v):
                zz = planes[ci]["blocks"][m * h * v + b]
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                t = _category(diff)
                w.put(dc_codes[t], dc_len)
                if t:
                    w.put(
                        diff if diff >= 0 else diff + (1 << t) - 1, t
                    )
                k = 1
                while k < 64:
                    if all(x == 0 for x in zz[k:]):
                        _enc_coef(w, ac_codes, ac_len, 0x00, 0)
                        break
                    run = 0
                    while zz[k] == 0:
                        run += 1
                        k += 1
                    while run >= 16:
                        _enc_coef(w, ac_codes, ac_len, 0xF0, 0)
                        run -= 16
                    s = _category(zz[k])
                    _enc_coef(w, ac_codes, ac_len, (run << 4) | s, zz[k])
                    k += 1
    emitted += w.flush()
    return bytes(out) + bytes(emitted) + b"\xff\xd9"


def _gray(blocks, h, w):
    return [{"size": (h, w), "blocks": blocks}]


Q1 = [1] * 64


def test_dc_only_grayscale_exact():
    """IDCT of a DC-only block is flat: every pixel is exactly
    clamp(round(128 + dc/8)). One 8x8 image per DC value across the
    whole signed range."""
    for dc in (0, 8, -8, 100, -1024, 1016, 4, -4, 3):
        zz = [dc] + [0] * 63
        data = encode_jpeg(_gray([zz], 8, 8), [(1, 1)], Q1)
        arr = decode_jpeg_baseline(data)
        assert arr is not None and arr.shape == (8, 8, 1)
        want = int(np.clip(np.floor(128 + dc / 8 + 0.5), 0, 255))
        assert (arr == want).all(), (dc, arr[0, 0, 0], want)


def test_dc_differential_across_blocks():
    """Two horizontal blocks: the second DC is coded as a DIFF from
    the first; flat values must come out per-block, not cumulative."""
    zz1 = [80] + [0] * 63
    zz2 = [-40] + [0] * 63
    data = encode_jpeg(_gray([zz1, zz2], 8, 16), [(1, 1)], Q1)
    arr = decode_jpeg_baseline(data)
    assert arr.shape == (8, 16, 1)
    assert (arr[:, :8, 0] == 138).all()  # 128 + 80/8
    assert (arr[:, 8:, 0] == 123).all()  # 128 + (-40)/8


def test_ac_coefficients_match_reference_idct():
    """A block with several AC coefficients (and a 16-zero ZRL run)
    must match the independent textbook IDCT exactly after the same
    descale (+128, round-half-away, clamp)."""
    zz = [0] * 64
    zz[0], zz[1], zz[5], zz[28], zz[60] = 16, 90, -70, 55, 33
    q = list(range(1, 65))  # non-trivial quant table
    data = encode_jpeg(_gray([zz], 8, 8), [(1, 1)], q)
    arr = decode_jpeg_baseline(data)
    coef = np.zeros((8, 8))
    for i, (r, c) in enumerate(_ZZ_PAIRS):
        coef[r, c] = zz[i] * q[i]
    want = np.clip(
        np.floor(_idct_ref(coef) + 128 + 0.5), 0, 255
    ).astype(np.uint8)
    assert (arr[:, :, 0] == want).all()


def test_quant_table_applied():
    zz = [10] + [0] * 63
    q = [5] + [1] * 63
    data = encode_jpeg(_gray([zz], 8, 8), [(1, 1)], q)
    arr = decode_jpeg_baseline(data)
    assert (arr == int(np.floor(128 + 50 / 8 + 0.5))).all()


def test_ycbcr_420_color_exact():
    """2x2-subsampled color: 4 luma blocks + 1 Cb + 1 Cr per MCU,
    all DC-only, so the JFIF color transform is checked against the
    analytic formula on flat planes (replication upsample = exact)."""
    y_dc, cb_dc, cr_dc = 160, -240, 200  # Y=148, Cb=98, Cr=153
    yb = [[y_dc] + [0] * 63] * 4
    cbb = [[cb_dc] + [0] * 63]
    crb = [[cr_dc] + [0] * 63]
    planes = [
        {"size": (16, 16), "blocks": yb},
        {"size": (16, 16), "blocks": cbb},
        {"size": (16, 16), "blocks": crb},
    ]
    data = encode_jpeg(planes, [(2, 2), (1, 1), (1, 1)], Q1)
    arr = decode_jpeg_baseline(data)
    assert arr.shape == (16, 16, 3)
    y = np.clip(np.floor(128 + y_dc / 8 + 0.5), 0, 255)
    cb = np.clip(np.floor(128 + cb_dc / 8 + 0.5), 0, 255) - 128
    cr = np.clip(np.floor(128 + cr_dc / 8 + 0.5), 0, 255) - 128
    want = [
        int(np.clip(np.floor(y + 1.402 * cr + 0.5), 0, 255)),
        int(np.clip(np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5), 0, 255)),
        int(np.clip(np.floor(y + 1.772 * cb + 0.5), 0, 255)),
    ]
    for ch in range(3):
        assert (arr[:, :, ch] == want[ch]).all(), (ch, arr[0, 0, ch], want)


def test_ycbcr_422_ac_against_reference_idct():
    """4:2:2 (h=2, v=1 luma): 2 Y blocks + 1 Cb + 1 Cr per MCU, with
    AC content in every component — checked against the independent
    IDCT + horizontal replication upsample + JFIF transform, all
    recomputed in the test."""
    yb0, yb1 = [0] * 64, [0] * 64
    yb0[0], yb0[2], yb0[9] = 64, 40, -36
    yb1[0], yb1[1] = -48, 24
    cbb, crb = [0] * 64, [0] * 64
    cbb[0], cbb[3] = 80, 20
    crb[0], crb[5] = -72, -16
    q = [2] * 64
    planes = [
        {"size": (8, 16), "blocks": [yb0, yb1]},
        {"size": (8, 16), "blocks": [cbb]},
        {"size": (8, 16), "blocks": [crb]},
    ]
    data = encode_jpeg(planes, [(2, 1), (1, 1), (1, 1)], q)
    arr = decode_jpeg_baseline(data)
    assert arr.shape == (8, 16, 3)

    def plane(zz):
        coef = np.zeros((8, 8))
        for i, (r, c) in enumerate(_ZZ_PAIRS):
            coef[r, c] = zz[i] * q[i]
        return np.clip(np.floor(_idct_ref(coef) + 128 + 0.5), 0, 255)

    y = np.hstack([plane(yb0), plane(yb1)])          # 8x16
    cb = np.repeat(plane(cbb), 2, axis=1) - 128      # horizontal rep
    cr = np.repeat(plane(crb), 2, axis=1) - 128
    want = np.stack(
        [
            np.clip(np.floor(y + 1.402 * cr + 0.5), 0, 255),
            np.clip(
                np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5), 0, 255
            ),
            np.clip(np.floor(y + 1.772 * cb + 0.5), 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    assert (arr == want).all()


def test_ycbcr_444_multiblock_ac():
    """4:4:4 color, 2x1 MCUs, AC in all three channels of both MCUs —
    the interleaved component order (Y,Cb,Cr per MCU) reassembles
    correctly."""
    def blk(*pairs):
        z = [0] * 64
        for i, v in pairs:
            z[i] = v
        return z

    q = [1] * 64
    yb = [blk((0, 80), (1, 30)), blk((0, -80), (4, 22))]
    cbb = [blk((0, 40)), blk((0, -40), (2, 18))]
    crb = [blk((0, -56), (6, 14)), blk((0, 56))]
    planes = [
        {"size": (8, 16), "blocks": yb},
        {"size": (8, 16), "blocks": cbb},
        {"size": (8, 16), "blocks": crb},
    ]
    data = encode_jpeg(planes, [(1, 1), (1, 1), (1, 1)], q)
    arr = decode_jpeg_baseline(data)
    assert arr.shape == (8, 16, 3)

    def plane(zz):
        coef = np.zeros((8, 8))
        for i, (r, c) in enumerate(_ZZ_PAIRS):
            coef[r, c] = zz[i] * q[i]
        return np.clip(np.floor(_idct_ref(coef) + 128 + 0.5), 0, 255)

    y = np.hstack([plane(z) for z in yb])
    cb = np.hstack([plane(z) for z in cbb]) - 128
    cr = np.hstack([plane(z) for z in crb]) - 128
    want = np.stack(
        [
            np.clip(np.floor(y + 1.402 * cr + 0.5), 0, 255),
            np.clip(
                np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5), 0, 255
            ),
            np.clip(np.floor(y + 1.772 * cb + 0.5), 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    assert (arr == want).all()


def test_non_multiple_of_8_crops():
    """A 5x11 image needs 1x2 blocks; the decoder must crop the
    padded plane back to the declared frame size."""
    blocks = [[24] + [0] * 63, [24] + [0] * 63]
    data = encode_jpeg(_gray(blocks, 5, 11), [(1, 1)], Q1)
    arr = decode_jpeg_baseline(data)
    assert arr.shape == (5, 11, 1)
    assert (arr == 131).all()


def test_restart_markers_reset_predictors():
    """With DRI=1 every MCU is its own interval: DC predictors reset,
    so each block's DC is coded absolute. Four blocks, four values."""
    dcs = [8, 80, -80, 16]
    blocks = [[d] + [0] * 63 for d in dcs]
    data = encode_jpeg(_gray(blocks, 8, 32), [(1, 1)], Q1, restart=1)
    assert b"\xff\xd0" in data  # RST0 actually present
    arr = decode_jpeg_baseline(data)
    for i, d in enumerate(dcs):
        want = int(np.floor(128 + d / 8 + 0.5))
        assert (arr[:, 8 * i : 8 * i + 8, 0] == want).all()


def test_single_component_scan_is_noninterleaved():
    """T.81 A.2 (r11 review): a grayscale JPEG may legally DECLARE
    2x2 sampling factors, but any single-component scan is
    non-interleaved — blocks arrive in raster order, one per MCU,
    factors ignored. Honoring the factors would consume 4 blocks per
    16x16 tile and scramble a 32x16 image silently."""
    # 32x16 = 4x2 blocks in raster order, distinct flat values
    dcs = [8 * k for k in range(8)]
    blocks = [[d] + [0] * 63 for d in dcs]
    data = encode_jpeg(_gray(blocks, 16, 32), [(1, 1)], Q1)
    # rewrite the SOF sampling byte from 0x11 to 0x22 (declared 2x2)
    sof_at = data.index(b"\xff\xc0")
    comp0 = sof_at + 2 + 2 + 1 + 4 + 1  # marker+len+prec+dims+ncomp
    assert data[comp0 + 1] == 0x11
    mutated = data[: comp0 + 1] + b"\x22" + data[comp0 + 2 :]
    arr = decode_jpeg_baseline(mutated)
    want = decode_jpeg_baseline(data)
    assert arr is not None and (arr == want).all()
    for k, d in enumerate(dcs):  # raster order, not tile order
        y, x = divmod(k, 4)
        v = int(np.floor(128 + d / 8 + 0.5))
        assert (arr[8 * y : 8 * y + 8, 8 * x : 8 * x + 8, 0] == v).all()


def test_huge_sof_amplification_guard():
    """r11 review: a crafted small payload declaring 65535x65535
    must be rejected by the blocks-vs-entropy-bits bound BEFORE the
    decode loop can accumulate gigabytes — None, and fast."""
    import struct
    import time

    zz = [8] + [0] * 63
    data = encode_jpeg(_gray([zz], 8, 8), [(1, 1)], Q1)
    sof_at = data.index(b"\xff\xc0")
    dims_at = sof_at + 5  # after marker+len+precision
    mutated = (
        data[:dims_at]
        + struct.pack(">HH", 65535, 65535)
        + data[dims_at + 4 :]
    )
    t0 = time.time()
    assert decode_jpeg_baseline(mutated) is None
    assert time.time() - t0 < 2.0


def test_out_of_envelope_and_malformed_return_none():
    zz = [8] + [0] * 63
    good = encode_jpeg(_gray([zz], 8, 8), [(1, 1)], Q1)
    # progressive: flip SOF0 -> SOF2
    assert decode_jpeg_baseline(good.replace(b"\xff\xc0", b"\xff\xc2")) is None
    # arithmetic sequential: SOF0 -> SOF9
    assert decode_jpeg_baseline(good.replace(b"\xff\xc0", b"\xff\xc9")) is None
    # truncated mid-scan
    assert decode_jpeg_baseline(good[:-10]) is None
    # not a JPEG at all
    assert decode_jpeg_baseline(b"\x89PNG\r\n\x1a\n....") is None
    assert decode_jpeg_baseline(b"") is None
    # the untouched payload still decodes (the mutations above were
    # the only difference)
    assert decode_jpeg_baseline(good) is not None


def test_never_raises_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    zz = [8] + [0] * 63
    good = encode_jpeg(_gray([zz], 8, 8), [(1, 1)], Q1)

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=1024))
    def prop(data):
        out = decode_jpeg_baseline(data)
        assert out is None or out.dtype == np.uint8

    prop()

    # single-byte corruptions of a valid payload: decode or None,
    # never an exception
    @settings(max_examples=150, deadline=None)
    @given(
        st.integers(min_value=0, max_value=len(good) - 1),
        st.integers(min_value=0, max_value=255),
    )
    def prop_mut(pos, val):
        mutated = good[:pos] + bytes([val]) + good[pos + 1 :]
        out = decode_jpeg_baseline(mutated)
        assert out is None or out.dtype == np.uint8

    prop_mut()


def test_decode_raster_dispatches_jpeg():
    from relationalize_spark.operators.multimodal import decode_raster

    zz = [80] + [0] * 63
    data = encode_jpeg(_gray([zz], 8, 8), [(1, 1)], Q1)
    fmt, h, w, c, arr = decode_raster(data)
    assert (fmt, h, w, c) == ("jpeg", 8, 8, 1)
    assert (arr == 138).all()


def test_avi_keyframes_to_pixels_end_to_end(spark):
    """The lane the verdict asked to close: AVI payload -> RIFF
    walker keyframes -> decode_images -> real per-channel stats,
    entirely in-container. decode_images accepts the walker's output
    column directly."""
    from test_media_pipeline import _avi

    from relationalize_spark.operators.multimodal import (
        decode_images,
        sample_frames,
    )

    f0 = encode_jpeg(_gray([[80] + [0] * 63], 8, 8), [(1, 1)], Q1)
    f1 = encode_jpeg(_gray([[-80] + [0] * 63], 8, 8), [(1, 1)], Q1)
    df = spark.createDataFrame(
        [(1, bytearray(_avi([f0, f1])))], "doc_id long, content binary"
    )
    frames = sample_frames(df, n_frames=2, mode="auto")
    decoded = decode_images(
        frames, binary_col="frame", id_cols=("doc_id", "frame_idx")
    )
    got = {
        r.frame_idx: (r.format, r.height, r.width, r.channel_means)
        for r in decoded.collect()
    }
    assert got[0] == ("jpeg", 8, 8, [138.0])
    assert got[1] == ("jpeg", 8, 8, [118.0])
