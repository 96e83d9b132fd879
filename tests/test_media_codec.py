"""Tests for the pure-numpy media codecs and the real-decode Spark path.

Round-trip properties (encode→decode identity) across shapes, channel
counts, and every PNG scanline filter; malformed-input rejection; and the
Arrow-batched ``decode_features`` stage against hand-computed features.
"""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from furchild_spark.operators import media_codec as mc
from furchild_spark.operators import multimodal


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (17, 23), (4, 4, 3),
                                   (31, 2, 3)])
def test_png_roundtrip_all_filters(filter_type, shape):
    rng = np.random.default_rng(hash((filter_type,) + shape) % 2**32)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = mc.encode_png(arr, filter_type=filter_type)
    out = mc.decode_png(data)
    assert out.shape == arr.shape
    assert (out == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3]),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_property(w, h, ch, ft, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, 3)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert (mc.decode_png(mc.encode_png(arr, filter_type=ft)) == arr).all()


def test_png_rejects_bad_signature():
    with pytest.raises(mc.MediaFormatError, match="signature"):
        mc.decode_png(b"notapng" + b"\x00" * 64)


def test_png_rejects_crc_corruption():
    data = bytearray(mc.encode_png(np.zeros((4, 4), dtype=np.uint8)))
    # flip one byte inside the IDAT body (after sig+IHDR chunk = 8+25)
    data[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(mc.MediaFormatError, match="CRC"):
        mc.decode_png(bytes(data))


def test_png_rejects_truncation():
    data = mc.encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(mc.MediaFormatError):
        mc.decode_png(data[: len(data) - 6])


def test_png_rejects_unsupported_depth():
    # hand-build an IHDR claiming 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(mc.MediaFormatError, match="depth"):
        mc.decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


# ---------------------------------------------------------------------------
# BMP / WAV
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(1, 1, 3), (5, 3, 3), (6, 7, 3)])
def test_bmp_roundtrip_including_row_padding(shape):
    # widths 1/3/7 exercise 1..3 bytes of 4-byte row padding
    rng = np.random.default_rng(shape[1])
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert (mc.decode_bmp(mc.encode_bmp(arr)) == arr).all()


def test_bmp_rejects_truncation():
    data = mc.encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(mc.MediaFormatError, match="truncated"):
        mc.decode_bmp(data[:-8])


@pytest.mark.parametrize("n,ch,rate", [(1, 1, 8000), (777, 1, 16000),
                                       (250, 2, 44100)])
def test_wav_roundtrip(n, ch, rate):
    rng = np.random.default_rng(n)
    s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    out, r = mc.decode_wav(mc.encode_wav(s, rate))
    assert r == rate
    assert out.shape == (n, ch)
    assert (out == s).all()


def test_wav_rejects_non_pcm16():
    s = np.zeros(10, dtype=np.int16)
    data = bytearray(mc.encode_wav(s, 8000))
    # fmt chunk audio_format field lives at offset 20 (RIFF hdr 12 + 'fmt '
    # id+size 8); set it to 3 (IEEE float)
    data[20] = 3
    with pytest.raises(mc.MediaFormatError, match="PCM16"):
        mc.decode_wav(bytes(data))


def test_sniff_format():
    assert mc.sniff_format(mc.encode_png(np.zeros((2, 2), np.uint8))) == "png"
    assert mc.sniff_format(
        mc.encode_bmp(np.zeros((2, 2, 3), np.uint8))) == "bmp"
    assert mc.sniff_format(
        mc.encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
    assert mc.sniff_format(b"\x00\x01\x02\x03garbagegarbage") == "unknown"


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

def test_resize_nearest_exact_index_map():
    arr = np.arange(12 * 8, dtype=np.uint8).reshape(12, 8)
    out = mc.resize_nearest(arr, 4, 6)
    ys, xs = (np.arange(6) * 12) // 6, (np.arange(4) * 8) // 4
    assert (out == arr[ys][:, xs]).all()
    # identity resize is a no-op
    assert (mc.resize_nearest(arr, 8, 12) == arr).all()


# ---------------------------------------------------------------------------
# Spark decode stages (real codec through Arrow-batched mapInPandas)
# ---------------------------------------------------------------------------

def test_decode_features_matches_formula(spark):
    ids = spark.range(0, 40).selectExpr("id AS doc_id")
    feats = multimodal.decode_features(
        multimodal.synthesize_payloads(ids, "doc_id", kind="image")
    ).collect()
    assert len(feats) == 40
    for r in sorted(feats, key=lambda r: r.id):
        rid = r.id
        w, h = rid % 31 + 2, rid % 17 + 2
        ch = 1 if rid % 2 == 0 else 3
        expect = sum(
            (rid + x + 3 * y + 85 * c) % 256
            for y in range(h) for x in range(w) for c in range(ch)
        )
        assert (r.fmt, r.width, r.height, r.channels) == (
            "png" if rid % 2 == 0 else "bmp", w, h, ch)
        assert r.value_sum == expect


def test_decode_features_audio(spark):
    ids = spark.range(0, 9).selectExpr("id AS doc_id")
    feats = multimodal.decode_features(
        multimodal.synthesize_payloads(ids, "doc_id", kind="audio")
    ).collect()
    for r in feats:
        rid = r.id
        n = rid % 400 + 50
        rate = (8000, 16000, 44100)[rid % 3]
        assert (r.fmt, r.n_frames, r.sample_rate) == ("wav", n, rate)
        assert r.value_sum == sum(
            (rid * 31 + i * 17) % 4001 - 2000 for i in range(n))
        assert r.duration_ms == n * 1000 // rate


def test_decode_features_rejects_garbage(spark):
    from pyspark.errors.exceptions.captured import PythonException

    df = spark.createDataFrame(
        [(1, bytearray(b"not media at all"))], "id long, payload binary")
    with pytest.raises(PythonException, match="undecodable"):
        multimodal.decode_features(df).collect()


def test_extract_features_real_decode_path(spark):
    """decode_stub=False parses genuine PNG bytes for width/height."""
    arr = np.zeros((7, 11), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(mc.encode_png(arr)))], "id long, content binary")
    payloads = multimodal.attach_payload(df, "id", "content", "image")
    row = multimodal.extract_features(payloads, decode_stub=False).collect()[0]
    assert (row.width, row.height, row.n_frames) == (11, 7, 1)


def test_decode_stages_are_map_only(spark):
    ids = spark.range(0, 10).selectExpr("id AS doc_id")
    feats = multimodal.decode_features(
        multimodal.synthesize_payloads(ids, "doc_id", kind="image"))
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
