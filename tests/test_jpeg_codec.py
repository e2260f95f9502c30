"""Baseline JPEG codec: roundtrip guarantees and decode honesty.

The codec (extensions/jpeg.py) implements T.81 baseline-sequential
grayscale. Exactness contract: constant-per-8x8-block rasters round-trip
bit-exactly (DC quant 8); general rasters round-trip within quantization
error (AC quant 16 → per-coefficient error ≤ 8, spatially spread by the
orthonormal IDCT)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_consumer_spark.extensions.jpeg import decode_jpeg, encode_jpeg
from etl_consumer_spark.extensions.multimodal import sniff_and_decode


def test_constant_block_exact_roundtrip():
    rng = np.random.RandomState(42)
    for _ in range(5):
        blocks = rng.randint(0, 256, (3, 5), dtype=np.uint8)
        img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        w, h, out = decode_jpeg(encode_jpeg(img))
        assert (w, h) == (40, 24)
        np.testing.assert_array_equal(out, img)


def test_extreme_values_exact():
    img = np.kron(
        np.array([[0, 255], [128, 1]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    _, _, out = decode_jpeg(encode_jpeg(img))
    np.testing.assert_array_equal(out, img)


def test_general_raster_bounded_error():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(img))
    err = np.abs(out.astype(int) - img.astype(int))
    # worst-case q-error per coefficient is 8; energy spreads over the block.
    # Empirical max for uniform noise is ~15; assert a safe spec-true bound.
    assert err.max() <= 64
    assert err.mean() <= 8


def test_smooth_gradient_small_error():
    x = np.linspace(0, 255, 32 * 48).reshape(32, 48).astype(np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(x))
    assert np.abs(out.astype(int) - x.astype(int)).max() <= 4


def test_non_multiple_of_8_cropped():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (13, 21), dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (21, 13)
    assert out.shape == (13, 21)


def test_dc_prediction_across_blocks():
    """A long row of blocks exercises DC difference coding both directions."""
    vals = np.array([[10, 250, 10, 250, 128, 0, 255, 77]], dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    _, _, out = decode_jpeg(encode_jpeg(img))
    np.testing.assert_array_equal(out, img)


def test_sniff_dispatches_jpeg():
    img = np.kron(np.array([[9, 200]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8))
    fmt, w, h, px = sniff_and_decode(encode_jpeg(img))
    assert fmt == "jpeg"
    assert (w, h) == (16, 8)
    assert px.shape == (8, 16, 3)
    # replicated channels, exact values
    np.testing.assert_array_equal(px[:, :, 0], img)
    np.testing.assert_array_equal(px[:, :, 1], img)


def test_decoder_rejects_progressive_and_truncated():
    img = np.full((8, 8), 100, dtype=np.uint8)
    blob = bytearray(encode_jpeg(img))
    # flip SOF0 (0xC0) to SOF2 (0xC2, progressive) — find the marker
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(img)[:-10] )


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG....")


# ---------------------------------------------------------------------------
# MJPEG-in-AVI container (composes the RIFF walk with the JPEG decoder)
# ---------------------------------------------------------------------------

def test_avi_mjpeg_roundtrip_exact():
    from etl_consumer_spark.extensions.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    rng = np.random.RandomState(9)
    frames = [
        np.kron(rng.randint(0, 256, (2, 4), dtype=np.uint8), np.ones((8, 8), np.uint8))
        for _ in range(4)
    ]
    n, w, h, out = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    assert (n, w, h) == (4, 32, 16)
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_avi_rejects_non_avi_and_truncated():
    from etl_consumer_spark.extensions.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    img = np.full((8, 8), 77, dtype=np.uint8)
    blob = encode_avi_mjpeg([img])
    with pytest.raises(ValueError):
        decode_avi_mjpeg(blob[:-6])


def _mutate_header(blob: bytes, insert: bytes) -> bytes:
    """Insert raw marker bytes right after SOI."""
    return blob[:2] + insert + blob[2:]


def test_decoder_tolerates_fill_bytes_and_standalone_markers():
    """T.81 B.1.1.2 hardening: 0xFF fill padding before a marker and
    length-less standalone markers (TEM) in the header must not derail the
    segment walk."""
    img = np.kron(
        np.array([[10, 200]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    blob = encode_jpeg(img)
    # fill bytes before the first real segment + a TEM standalone marker
    hardened = _mutate_header(blob, b"\xff\xff\xff" + b"\xff\x01")
    w, h, out = decode_jpeg(hardened)
    assert (w, h) == (16, 8)
    np.testing.assert_array_equal(out, img)


def test_decoder_tolerates_trailing_bytes_after_eoi():
    """Trailing garbage after EOI is common in the wild; the entropy end
    must be found by scanning for the marker, not len(blob)-2."""
    img = np.kron(
        np.array([[7], [250]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    blob = encode_jpeg(img) + b"trailing-junk-after-eoi\x00\xff\x12"
    w, h, out = decode_jpeg(blob)
    assert (w, h) == (8, 16)
    np.testing.assert_array_equal(out, img)


def test_decoder_rejects_zero_length_segment():
    img = np.full((8, 8), 42, dtype=np.uint8)
    blob = encode_jpeg(img)
    # an APP0 segment claiming length 0 is framing corruption, not EOF
    bad = _mutate_header(blob, b"\xff\xe0\x00\x00")
    with pytest.raises(ValueError):
        decode_jpeg(bad)
