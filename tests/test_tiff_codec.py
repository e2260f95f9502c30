"""TIFF 6.0 codec: roundtrip exactness, strip handling, malformed inputs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_consumer_spark.extensions.tiff import decode_tiff, encode_tiff


def _img(h, w, seed=1):
    rng = np.arange(h * w, dtype=np.int64) * seed * 7919 % 256
    return rng.astype(np.uint8).reshape(h, w)


@pytest.mark.parametrize("h,w,rps", [(4, 24, 2), (4, 24, 4), (1, 1, 1), (7, 5, 3), (5, 8, 64)])
def test_roundtrip_exact(h, w, rps):
    img = _img(h, w)
    w2, h2, got = decode_tiff(encode_tiff(img, rows_per_strip=rps))
    assert (w2, h2) == (w, h)
    assert np.array_equal(got, img)


def test_multi_strip_actually_emitted():
    blob = encode_tiff(_img(4, 6), rows_per_strip=2)
    # find StripOffsets (273): count must be 2
    (ifd_pos,) = struct.unpack("<I", blob[4:8])
    (n,) = struct.unpack("<H", blob[ifd_pos : ifd_pos + 2])
    counts = {}
    for i in range(n):
        e = blob[ifd_pos + 2 + 12 * i : ifd_pos + 2 + 12 * (i + 1)]
        tag, typ, cnt = struct.unpack("<HHI", e[:8])
        counts[tag] = cnt
    assert counts[273] == 2 and counts[279] == 2


def test_rejects_bad_magic_and_truncation():
    blob = encode_tiff(_img(4, 4))
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"MM\x00\x2a" + blob[4:])  # big-endian unsupported
    with pytest.raises(ValueError):
        decode_tiff(blob[:10])


def test_rejects_out_of_bounds_strip():
    blob = bytearray(encode_tiff(_img(4, 4), rows_per_strip=64))
    # single strip: StripOffsets value is inline; point it past the end
    (ifd_pos,) = struct.unpack("<I", bytes(blob[4:8]))
    (n,) = struct.unpack("<H", bytes(blob[ifd_pos : ifd_pos + 2]))
    for i in range(n):
        base = ifd_pos + 2 + 12 * i
        tag = struct.unpack("<H", bytes(blob[base : base + 2]))[0]
        if tag == 273:
            blob[base + 8 : base + 12] = struct.pack("<I", len(blob) + 100)
    with pytest.raises(ValueError, match="bounds"):
        decode_tiff(bytes(blob))


def test_rejects_unsupported_compression():
    blob = bytearray(encode_tiff(_img(4, 4)))
    (ifd_pos,) = struct.unpack("<I", bytes(blob[4:8]))
    (n,) = struct.unpack("<H", bytes(blob[ifd_pos : ifd_pos + 2]))
    for i in range(n):
        base = ifd_pos + 2 + 12 * i
        tag = struct.unpack("<H", bytes(blob[base : base + 2]))[0]
        if tag == 259:
            blob[base + 8 : base + 10] = struct.pack("<H", 5)  # LZW: not ours
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(blob))


def test_rejects_byte_count_mismatch():
    img = _img(4, 4)
    blob = bytearray(encode_tiff(img, rows_per_strip=64))
    (ifd_pos,) = struct.unpack("<I", bytes(blob[4:8]))
    (n,) = struct.unpack("<H", bytes(blob[ifd_pos : ifd_pos + 2]))
    for i in range(n):
        base = ifd_pos + 2 + 12 * i
        tag = struct.unpack("<H", bytes(blob[base : base + 2]))[0]
        if tag == 279:
            blob[base + 8 : base + 12] = struct.pack("<I", 15)  # != 16
    with pytest.raises(ValueError, match="strip bytes"):
        decode_tiff(bytes(blob))


def test_sniff_dispatch():
    from etl_consumer_spark.extensions.multimodal import sniff_and_decode

    img = _img(4, 6, seed=3)
    fmt, w, h, rgb = sniff_and_decode(encode_tiff(img))
    assert fmt == "tiff" and (w, h) == (6, 4)
    assert np.array_equal(rgb[:, :, 0], img) and np.array_equal(rgb[:, :, 2], img)
