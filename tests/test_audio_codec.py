"""WAV (RIFF PCM) codec: lossless roundtrip, chunk-walk robustness,
feature extraction exactness."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_consumer_spark.extensions.audio import (
    audio_features,
    decode_wav,
    encode_wav,
)


def test_lossless_roundtrip():
    rng = np.random.RandomState(11)
    for n in (1, 32, 1000):
        v = rng.randint(-32768, 32768, n).astype(np.int16)
        sr, out = decode_wav(encode_wav(v, 8000))
        assert sr == 8000
        np.testing.assert_array_equal(out, v)


def test_extreme_samples():
    v = np.array([-32768, 32767, 0, -1, 1], dtype=np.int16)
    _, out = decode_wav(encode_wav(v))
    np.testing.assert_array_equal(out, v)


def test_skips_unknown_chunks():
    """Real WAVs carry LIST/fact chunks; the decoder must walk past them."""
    v = np.array([5, -5, 10], dtype=np.int16)
    blob = bytearray(encode_wav(v, 44100))
    # splice a LIST chunk between fmt and data (offset 12 = first chunk)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt_end = 12 + 8 + 16  # RIFF/WAVE header + fmt chunk
    blob[fmt_end:fmt_end] = extra
    # fix RIFF size
    blob[4:8] = struct.pack("<I", len(blob) - 8)
    sr, out = decode_wav(bytes(blob))
    assert sr == 44100
    np.testing.assert_array_equal(out, v)


def test_odd_sized_chunk_word_alignment():
    """Chunks are word-aligned: an odd-sized unknown chunk has a pad byte."""
    v = np.array([7], dtype=np.int16)
    blob = bytearray(encode_wav(v))
    extra = b"junk" + struct.pack("<I", 3) + b"abc\x00"  # 3 bytes + pad
    fmt_end = 12 + 8 + 16
    blob[fmt_end:fmt_end] = extra
    blob[4:8] = struct.pack("<I", len(blob) - 8)
    _, out = decode_wav(bytes(blob))
    np.testing.assert_array_equal(out, v)


def test_rejects_non_pcm_and_truncated():
    v = np.array([1, 2], dtype=np.int16)
    blob = bytearray(encode_wav(v))
    blob[20] = 3  # wFormatTag -> IEEE float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x10\x00\x00\x00WAVEfmt ")
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")


def test_features_integer_exact():
    # digits (ascii 48..57) -> negative, letters (97..102) -> positive
    hexes = "0a1b2c3d"
    v = (np.frombuffer(hexes.encode(), dtype=np.uint8).astype(np.int16)) - 77
    blob = encode_wav(v, 16000)
    f = audio_features(blob)
    assert f["sample_rate"] == 16000
    assert f["n_samples"] == 8
    assert f["duration_ms"] == 0  # 8 * 1000 // 16000
    assert f["peak"] == int(np.abs(v.astype(int)).max())
    # alternating digit/letter -> sign flips at every step
    assert f["zero_crossings"] == 7
    expect_rms = float(np.sqrt((v.astype(np.int64) ** 2).sum() / 8))
    assert f["rms"] == expect_rms


def test_features_empty_data():
    f = audio_features(encode_wav(np.array([], dtype=np.int16), 16000))
    assert f["n_samples"] == 0 and f["rms"] == 0.0 and f["zero_crossings"] == 0
