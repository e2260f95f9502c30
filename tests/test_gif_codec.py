"""GIF87a codec: lossless LZW roundtrip guarantees and decode hardening.

GIF over an identity grayscale palette is lossless, so every raster must
round-trip bit-exactly — including rasters large enough to push the LZW
table through all code widths (9→12 bits) and past the 4096-entry reset.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_consumer_spark.extensions.gif import decode_gif, encode_gif


def test_small_roundtrip_exact():
    rng = np.random.RandomState(42)
    for _ in range(5):
        img = rng.randint(0, 256, (4, 36), dtype=np.uint8)
        w, h, rgb = decode_gif(encode_gif(img))
        assert (w, h) == (36, 4)
        np.testing.assert_array_equal(rgb[:, :, 0], img)
        np.testing.assert_array_equal(rgb[:, :, 1], img)  # gray palette


def test_code_width_growth_roundtrip():
    """4096 random pixels force several hundred table entries — the 9→10 bit
    boundary — and repetitive data grows long prefixes (KwKwK case)."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    _, _, rgb = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(rgb[:, :, 0], img)
    rep = np.tile(np.arange(16, dtype=np.uint8).repeat(7), 300).reshape(80, -1)
    _, _, rgb2 = decode_gif(encode_gif(rep))
    np.testing.assert_array_equal(rgb2[:, :, 0], rep)


def test_table_reset_roundtrip():
    """>4096 table additions force an in-stream CLEAR + table reset."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (300, 350), dtype=np.uint8)
    _, _, rgb = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(rgb[:, :, 0], img)


def test_constant_raster():
    img = np.full((16, 16), 200, dtype=np.uint8)
    _, _, rgb = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(rgb[:, :, 0], img)


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" * 4)
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) // 2])


def test_sniff_dispatches_gif():
    from etl_consumer_spark.extensions.multimodal import sniff_and_decode

    img = np.kron(
        np.array([[3, 250]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    fmt, w, h, px = sniff_and_decode(encode_gif(img))
    assert fmt == "gif" and (w, h) == (16, 8)
    np.testing.assert_array_equal(px[:, :, 0], img)
