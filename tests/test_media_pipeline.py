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


def _wav(freq=440, rate=8000, n=800, amp=20000):
    x = (np.sin(2 * np.pi * freq * np.arange(n) / rate) * amp).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def _wav_scaled(mult, freq=440, rate=8000, n=800, base_amp=9000):
    """An EXACT integer-gain twin of ``_wav(amp=base_amp)``: the same
    rounded base samples multiplied by ``mult`` (no re-rounding), so
    ehash64's gain invariance guarantees an identical fingerprint."""
    x = (np.sin(2 * np.pi * freq * np.arange(n) / rate) * base_amp).astype(
        "<i2"
    ).astype(np.int64)
    x = (x * mult).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_media_pipeline_end_to_end(spark, tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from test_jpeg_decode import _gray, encode_jpeg

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    arr2 = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)  # distinct
    media = tmp_path / "media"
    media.mkdir()
    (media / "a.ppm").write_bytes(_ppm(arr))
    (media / "b.bmp").write_bytes(_bmp(arr2))
    (media / "broken.ppm").write_bytes(b"P6 garbage header")
    (media / "tone.wav").write_bytes(_wav(amp=9000))
    (media / "notes.txt").write_bytes(b"ignored entirely")
    # r11: a real JPEG (flat gray — decodes in-container), the SAME
    # ppm pixels saved twice under different names (an exact
    # perceptual dup pair), and two videos sharing one keyframe
    jpg = encode_jpeg(_gray([[80] + [0] * 63], 8, 8), [(1, 1)], [1] * 64)
    (media / "c.jpg").write_bytes(jpg)
    (media / "a_copy.ppm").write_bytes(_ppm(arr))
    f_shared = encode_jpeg(
        _gray([[8 * k] + [0] * 63 for k in range(8)], 8, 64),
        [(1, 1)], [1] * 64,
    )
    f_other = encode_jpeg(
        _gray([[200 - 25 * k] + [0] * 63 for k in range(8)], 8, 64),
        [(1, 1)], [1] * 64,
    )
    (media / "v1.avi").write_bytes(_avi([f_shared, f_other]))
    (media / "v2.avi").write_bytes(_avi([f_shared]))
    # an exact-gain copy of the tone: the audio dedup lane pairs them
    (media / "tone_loud.wav").write_bytes(_wav_scaled(3))

    out = tmp_path / "out"
    counts = run(spark, str(media), str(out), target_hw=(4, 5))
    assert counts == {
        "images_ok": 4, "images_rejected": 1, "rasters": 4, "audio": 2,
        "image_dup_pairs": 1, "video_dup_pairs": 1, "audio_dup_pairs": 1,
    }

    rasters = spark.read.parquet(str(out / "image_rasters")).collect()
    assert all(
        (r.height, r.width) == (4, 5)
        and len(bytes(r.raster)) == 4 * 5 * (3 if r.channels == 3 else 1)
        for r in rasters
    )
    af = spark.read.parquet(str(out / "audio_features")).first()
    assert af.sample_rate == 8000 and af.n_samples == 800 and af.rms > 0.1
    dup = spark.read.parquet(str(out / "image_dups")).first()
    assert {dup.i.split("/")[-1], dup.j.split("/")[-1]} == {
        "a.ppm", "a_copy.ppm"
    } and dup.hamming == 0
    vdup = spark.read.parquet(str(out / "video_dups")).first()
    assert {vdup.i.split("/")[-1], vdup.j.split("/")[-1]} == {
        "v1.avi", "v2.avi"
    } and vdup.min_hamming == 0


# -- guarded optional codecs (r5) ------------------------------------------

def test_pil_decode_via_injected_module():
    """The library-present branch of image_features: _pil_decode run
    against a minimal fake PIL Image module (the container has no
    PIL). Verifies the geometry/mean/histogram contract on known
    pixels."""
    from relationalize_spark.operators.multimodal import FEATURE_DIM, _pil_decode

    class FakeGray:
        def __init__(self, arr):
            self._a = arr

        def __array__(self, dtype=None):
            a = np.asarray(self._a)
            return a.astype(dtype) if dtype is not None else a

    class FakeIm:
        def __init__(self, arr):
            self._a = arr

        def convert(self, mode):
            assert mode == "L"
            return FakeGray(self._a)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    arr = np.array([[0, 32, 64], [96, 128, 255]], dtype=np.uint8)

    class FakeImage:
        @staticmethod
        def open(bio):
            assert bio.read(4) == b"xyz1"
            return FakeIm(arr)

    w, h, mean, feats = _pil_decode(FakeImage, b"xyz1rest")
    assert (w, h) == (3, 2)
    assert abs(mean - arr.mean()) < 1e-9
    assert len(feats) == FEATURE_DIM and abs(sum(feats) - 1.0) < 1e-9
    # bucket = pixel >> 5: 0,1,2,3,4,7 each once
    assert [round(f * 6) for f in feats] == [1, 1, 1, 1, 1, 0, 0, 1]


def test_av_keyframes_via_injected_module():
    """The library-present branch of sample_frames: _av_keyframes run
    against a minimal fake PyAV module."""
    from relationalize_spark.operators.multimodal import _av_keyframes

    class FakeFrame:
        def __init__(self, payload):
            self._p = payload

        def to_ndarray(self, format):
            assert format == "rgb24"
            return np.frombuffer(self._p, dtype=np.uint8)

    class FakeCodecCtx:
        skip_frame = None

    class FakeStream:
        codec_context = FakeCodecCtx()

    class FakeStreams:
        video = [FakeStream()]

    class FakeContainer:
        streams = FakeStreams()

        def decode(self, stream):
            assert stream.codec_context.skip_frame == "NONKEY"
            return iter([FakeFrame(b"k0"), FakeFrame(b"k1"), FakeFrame(b"k2")])

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeAv:
        @staticmethod
        def open(bio):
            return FakeContainer()

    assert _av_keyframes(FakeAv, b"video-bytes", 2) == [b"k0", b"k1"]


def test_image_features_decoder_modes(spark):
    """decoder='stub' and (PIL-less) 'auto' agree byte-for-byte;
    decoder='pil' raises here because the library is genuinely
    absent."""
    import pytest

    from relationalize_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        [(1, bytearray(b"abcdef")), (2, None)], "doc_id long, content binary"
    )
    stub = {r.doc_id: (r.width, r.height, r.features) for r in
            image_features(df, decoder="stub").collect()}
    auto = {r.doc_id: (r.width, r.height, r.features) for r in
            image_features(df, decoder="auto").collect()}
    assert stub == auto
    assert stub[2] == (None, None, None)
    with pytest.raises(Exception, match="PIL"):
        image_features(df, decoder="pil").collect()
    with pytest.raises(ValueError):
        image_features(df, decoder="imagemagick")


def test_sample_frames_modes(spark):
    import pytest

    from relationalize_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, bytearray(b"0123456789ab"))],
                               "doc_id long, content binary")
    chunk = [(r.frame_idx, bytes(r.frame)) for r in
             sample_frames(df, n_frames=3, mode="chunk").collect()]
    auto = [(r.frame_idx, bytes(r.frame)) for r in
            sample_frames(df, n_frames=3, mode="auto").collect()]
    assert sorted(chunk) == sorted(auto) == [(0, b"0123"), (1, b"4567"), (2, b"89ab")]
    with pytest.raises(Exception, match="PyAV"):
        sample_frames(df, mode="av").collect()
    with pytest.raises(ValueError):
        sample_frames(df, mode="ffmpeg")


def _jpeg(payload: bytes) -> bytes:
    """Minimal well-formed-for-the-walker JPEG: SOI ... EOI."""
    return b"\xff\xd8" + payload + b"\xff\xd9"


def _avi(frames: list[bytes], junk_tail: bytes = b"") -> bytes:
    """Synthesize a minimal MJPEG-in-AVI: RIFF('AVI ') containing a
    LIST('hdrl') distractor and a LIST('movi') of 00dc chunks — the
    byte-exact-payload synthesis discipline of test_raster_images."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", b"\x00" * 14))
    movi_body = b"movi" + b"".join(
        chunk(b"00dc" if i % 2 == 0 else b"00db", f) for i, f in enumerate(frames)
    )
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + junk_tail
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_mjpeg_avi_walker_extracts_real_frames():
    """r10 (r8 verdict item 5, carried through r9): the codec-free
    real video path. RIFF walk + SOI/EOI validation, byte-exact."""
    from relationalize_spark.operators.multimodal import _mjpeg_avi_frames

    f = [_jpeg(b"frame-zero"), _jpeg(b"f1"), _jpeg(b"frame-two!"), _jpeg(b"3")]
    data = _avi(f)
    assert _mjpeg_avi_frames(data, 4) == f
    assert _mjpeg_avi_frames(data, 2) == f[:2]  # early stop
    # odd-length frame bodies exercise the even-padding rule
    odd = [_jpeg(b"x"), _jpeg(b"yy")]
    assert _mjpeg_avi_frames(_avi(odd), 4) == odd
    # non-JPEG video chunks are skipped, not returned
    mixed = _avi([_jpeg(b"ok"), b"not-a-jpeg-frame"])
    assert _mjpeg_avi_frames(mixed, 4) == [_jpeg(b"ok")]
    # not RIFF / not AVI / empty movi -> None (caller falls back)
    assert _mjpeg_avi_frames(b"RIFF\x04\x00\x00\x00WAVE", 4) is None
    assert _mjpeg_avi_frames(b"garbage", 4) is None
    assert _mjpeg_avi_frames(_avi([]), 4) is None
    # truncated tail stops the walk cleanly
    assert _mjpeg_avi_frames(data[: len(data) - 7], 4) == f[:3]
    # trailing garbage after movi does not break earlier frames
    assert _mjpeg_avi_frames(_avi(f, junk_tail=b"\xff\xd8\xff"), 4) == f


def test_mjpeg_avi_walker_requires_movi_ancestry():
    """r11 ADVICE: ##dc/##db stream chunks count as frames ONLY under
    a movi (or rec ) LIST — SOI/EOI-framed bytes planted in hdrl,
    junk regions, or bare top-level chunks are structural garbage,
    not frames."""
    from relationalize_spark.operators.multimodal import _mjpeg_avi_frames

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    def riff(body: bytes) -> bytes:
        body = b"AVI " + body
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    decoy, real = _jpeg(b"planted"), _jpeg(b"genuine")
    # a crafted hdrl carrying a 00dc chunk with a valid JPEG payload,
    # and the same chunk bare at the top level: both ignored; only
    # the movi copy returns.
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"00dc", decoy))
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", real))
    data = riff(hdrl + chunk(b"00dc", decoy) + movi)
    assert _mjpeg_avi_frames(data, 4) == [real]
    # with no movi at all: None (caller falls back), even though the
    # decoys are byte-valid JPEGs
    assert _mjpeg_avi_frames(riff(hdrl + chunk(b"00dc", decoy)), 4) is None
    # OpenDML interleave grouping: rec  inside movi still collects,
    # and a top-level rec  grouping (seen in the wild) does too
    rec = chunk(b"LIST", b"rec " + chunk(b"01dc", real))
    assert _mjpeg_avi_frames(riff(chunk(b"LIST", b"movi" + rec)), 4) == [real]
    assert _mjpeg_avi_frames(riff(rec), 4) == [real]
    # an unrelated LIST type (INFO) does not grant ancestry
    info = chunk(b"LIST", b"INFO" + chunk(b"00db", decoy))
    assert _mjpeg_avi_frames(riff(info + movi), 4) == [real]


def test_mjpeg_avi_walker_never_raises_property():
    """Property: on ARBITRARY bytes (including adversarial deep
    nesting, the r10 review's RecursionError repro shape) the walker
    never raises, and anything it returns is a well-formed JPEG
    payload that appears in the input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from relationalize_spark.operators.multimodal import _mjpeg_avi_frames

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=4096))
    def prop(data):
        got = _mjpeg_avi_frames(data, 4)
        if got is not None:
            assert 1 <= len(got) <= 4
            for f in got:
                assert f[:2] == b"\xff\xd8" and f[-2:] == b"\xff\xd9"
                assert f in data

    prop()
    # RIFF-wrapped arbitrary interiors, and the deep-nesting repro
    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048))
    def prop_riff(body):
        data = b"RIFF" + (len(body) + 4).to_bytes(4, "little") + b"AVI " + body
        got = _mjpeg_avi_frames(data, 3)
        if got is not None:
            for f in got:
                assert f[:2] == b"\xff\xd8" and f[-2:] == b"\xff\xd9"

    prop_riff()
    deep = b"LIST" + (10**6).to_bytes(4, "little")
    bomb = b"RIFF" + (10**7).to_bytes(4, "little") + b"AVI " + deep * 3000
    assert _mjpeg_avi_frames(bomb, 4) is None  # no RecursionError


def test_sample_frames_real_avi_path(spark):
    """mode='auto' returns REAL byte-exact JPEG frames for an AVI
    payload (no libraries), chunks a non-video payload in the same
    batch, and mode='chunk' still pins the replayable stub."""
    from relationalize_spark.operators.multimodal import sample_frames

    frames = [_jpeg(b"AAAA"), _jpeg(b"BBBBBB"), _jpeg(b"CC")]
    avi = _avi(frames)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"0123456789ab"))],
        "doc_id long, content binary",
    )
    got = {}
    for r in sample_frames(df, n_frames=3, mode="auto").collect():
        got.setdefault(r.doc_id, []).append(
            (r.frame_idx, bytes(r.frame), r.frame_bytes)
        )
    assert sorted(got[1]) == [
        (i, f, len(f)) for i, f in enumerate(frames)
    ]
    assert sorted(got[2]) == [
        (0, b"0123", 4), (1, b"4567", 4), (2, b"89ab", 4)
    ]
    # chunk mode ignores the container: deterministic stub, pinned
    chunked = [bytes(r.frame) for r in sample_frames(
        df.where("doc_id = 1"), n_frames=3, mode="chunk").collect()]
    step = len(avi) // 3
    assert chunked == [avi[i * step:(i + 1) * step] for i in range(3)]
