"""Unit tests for the pure-Python image codecs (PPM P6 / 24-bit BMP) and
the kernel plumbing over real blobs."""

from __future__ import annotations

import numpy as np
import pytest

from etl_consumer_spark.extensions.multimodal import (
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    extract_image_features,
    extract_metadata,
    sniff_and_decode,
    synthesize_media_table,
)


def _raster(w, h, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def test_ppm_roundtrip():
    px = _raster(13, 7)
    blob = encode_ppm(px)
    w, h, out = decode_ppm(blob)
    assert (w, h) == (13, 7)
    np.testing.assert_array_equal(out, px)


def test_ppm_header_variants():
    px = _raster(2, 2)
    # comment lines and arbitrary whitespace between header tokens are legal
    blob = b"P6\n# a comment\n 2\t2 # trailing\n255\n" + px.tobytes()
    w, h, out = decode_ppm(blob)
    assert (w, h) == (2, 2)
    np.testing.assert_array_equal(out, px)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + px.tobytes())      # wrong magic
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + px.tobytes())    # unsupported maxval
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n" + b"\x00" * 5)       # truncated raster


def test_bmp_roundtrip_including_padding():
    # w=3 -> 9-byte rows padded to 12: exercises the 4-byte alignment path
    px = _raster(3, 5, seed=1)
    blob = encode_bmp(px)
    w, h, out = decode_bmp(blob)
    assert (w, h) == (3, 5)
    np.testing.assert_array_equal(out, px)
    fmt, w2, h2, out2 = sniff_and_decode(blob)
    assert fmt == "bmp" and (w2, h2) == (3, 5)
    np.testing.assert_array_equal(out2, px)


def test_bmp_rejects_compressed_or_other_depth():
    px = _raster(2, 2)
    blob = bytearray(encode_bmp(px))
    blob[28] = 8  # bpp -> 8
    with pytest.raises(ValueError):
        decode_bmp(bytes(blob))


def test_sniff_unknown_magic():
    with pytest.raises(ValueError):
        sniff_and_decode(b"GIF89a....")


def test_synthesized_blobs_are_real_ppm(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "sphinx of black quartz, judge my vow")],
        "doc_id long, text string",
    )
    media = synthesize_media_table(docs, "doc_id", "text").collect()
    for r in media:
        fmt, w, h, px = sniff_and_decode(bytes(r["blob"]))
        assert fmt == "ppm" and h == 4
        assert w == r["meta"]["width"]           # header agrees with meta
        assert px.size == w * 4 * 3
    feats = {
        r["media_id"]: r
        for r in extract_image_features(
            synthesize_media_table(docs, "doc_id", "text")
        ).collect()
    }
    # doc 1: "hello world" -> len 11 -> w = 8 + 3 = 11, n_px = 44
    assert feats[1]["n_px"] == 44
    meta = {r["media_id"]: r for r in extract_metadata(
        synthesize_media_table(docs, "doc_id", "text")).collect()}
    assert meta[1]["width"] == 11 and meta[1]["n_raster"] == 132


# -- PNG (stdlib zlib, RFC 2083) --------------------------------------------


def test_png_roundtrip_every_filter_type():
    """Encode/decode round-trip under each of the five scanline filters —
    the decoder must reconstruct identical pixels from any of them."""
    from etl_consumer_spark.extensions.multimodal import decode_png, encode_png

    px = _raster(13, 7, seed=3)
    for ft in range(5):
        blob = encode_png(px, filter_type=ft)
        w, h, out = decode_png(blob)
        assert (w, h) == (13, 7)
        np.testing.assert_array_equal(out, px)
    fmt, w2, h2, out2 = sniff_and_decode(encode_png(px, filter_type=4))
    assert fmt == "png" and (w2, h2) == (13, 7)
    np.testing.assert_array_equal(out2, px)


def test_png_roundtrip_property():
    """Randomized rasters across shapes and filters (seeded, deterministic)."""
    from etl_consumer_spark.extensions.multimodal import decode_png, encode_png

    for seed in range(8):
        rng = np.random.RandomState(seed)
        w, h = int(rng.randint(1, 24)), int(rng.randint(1, 12))
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)
        blob = encode_png(px, filter_type=seed % 5)
        w2, h2, out = decode_png(blob)
        assert (w2, h2) == (w, h)
        np.testing.assert_array_equal(out, px)


def test_png_rejects_corruption_and_unsupported():
    from etl_consumer_spark.extensions.multimodal import decode_png, encode_png

    px = _raster(4, 3)
    blob = bytearray(encode_png(px))
    blob[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX\r\n\x1a\n")
    # grayscale (color type 0) is out of scope -> explicit error
    import struct
    import zlib

    from etl_consumer_spark.extensions.multimodal import PNG_SIG, _png_chunk

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    gray = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00\x01\x02\x00\x03\x04")
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="truecolor"):
        decode_png(gray)


def test_synthesized_png_corpus_matches_ppm_features(spark):
    """The PNG corpus carries the SAME deterministic raster as the PPM one,
    so feature extraction over both must agree value-for-value — and the
    id % 5 filter cycling means all five unfilter paths run for real."""
    from etl_consumer_spark.extensions.multimodal import synthesize_png_media_table

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text padding") for i in range(10)],
        "doc_id long, text string",
    )
    png_media = synthesize_png_media_table(docs, "doc_id", "text")
    for r in png_media.collect():
        fmt, w, h, px = sniff_and_decode(bytes(r["blob"]))
        assert fmt == "png" and h == 4 and w == r["meta"]["width"]
    ppm_feats = sorted(
        extract_image_features(synthesize_media_table(docs, "doc_id", "text")).collect(),
        key=lambda r: r["media_id"],
    )
    png_feats = sorted(
        extract_image_features(png_media).collect(), key=lambda r: r["media_id"]
    )
    assert [tuple(r) for r in ppm_feats] == [tuple(r) for r in png_feats]


def test_resize_matches_numpy_reference(spark):
    """The registered resize query's md5 must equal a local numpy
    nearest-neighbor resize of the decoded plane."""
    import hashlib

    import numpy as np

    from etl_consumer_spark.plans.queries import QUERIES
    from etl_consumer_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["media_id"]: r["resized_md5"]
        for r in QUERIES["mm_resize_features"].fn(spark, sf).collect()
    }
    docs = load_table(spark, sf, "documents").select("doc_id", "text").collect()
    for r in docs[:50]:
        w = 8 + len(r["text"]) % 8
        hexes = (hashlib.md5(r["text"].encode()).hexdigest() * 6)[: w * 12]
        gray = np.frombuffer(hexes.encode(), dtype=np.uint8).reshape(4, w, 3)[:, :, 0]
        ys = (np.arange(2) * 4 // 2).clip(0, 3)
        xs = (np.arange(8) * w // 8).clip(0, w - 1)
        want = hashlib.md5(gray[np.ix_(ys, xs)].tobytes()).hexdigest()
        assert got[r["doc_id"]] == want
