"""Pure-Python baseline TIFF 6.0 codec (uncompressed grayscale, strips).

Implements the minimal honest subset of the public TIFF 6.0 specification
(Adobe, 1992): little-endian byte order, one image file directory (IFD),
8-bit single-sample grayscale, Compression=1 (none), pixel data in
multiple strips (``RowsPerStrip`` < height, so the strip walk is actually
exercised). Lossless, so decoded bytes are value-oracle-exact.

Decoder hardening, same contract as the sibling codecs (jpeg.py, gif.py):
nothing is trusted from the header without bounds checks — offsets and
byte counts are validated against the blob length, entry counts are
bounded, unsupported compression/photometric/bit-depth values raise
``ValueError`` instead of misdecoding.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF 6.0 tag ids (public spec, section 8)
TAG_WIDTH = 256
TAG_LENGTH = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279

TYPE_SHORT = 3  # 16-bit
TYPE_LONG = 4  # 32-bit

_MAGIC_LE = b"II\x2a\x00"


def encode_tiff(gray: np.ndarray, rows_per_strip: int = 2) -> bytes:
    """Encode an (h, w) uint8 grayscale array as an uncompressed
    little-endian TIFF with ``ceil(h / rows_per_strip)`` strips."""
    if gray.ndim != 2 or gray.dtype != np.uint8:
        raise ValueError("encode_tiff expects (h, w) uint8")
    h, w = gray.shape
    n_strips = -(-h // rows_per_strip)
    strips = [
        gray[i * rows_per_strip : (i + 1) * rows_per_strip].tobytes()
        for i in range(n_strips)
    ]
    # layout: header(8) | strip data | offsets array | counts array | IFD
    data_off = 8
    offsets, counts = [], []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        counts.append(len(s))
        pos += len(s)
    # arrays of LONGs (only needed when n_strips > 1; inline otherwise)
    off_array_pos = pos
    if n_strips > 1:
        pos += 4 * n_strips
    cnt_array_pos = pos
    if n_strips > 1:
        pos += 4 * n_strips
    ifd_pos = pos

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # value fits in the 4-byte field for every entry we emit
        if typ == TYPE_SHORT and count == 1:
            return struct.pack("<HHIHH", tag, typ, count, value, 0)
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        entry(TAG_WIDTH, TYPE_LONG, 1, w),
        entry(TAG_LENGTH, TYPE_LONG, 1, h),
        entry(TAG_BITS_PER_SAMPLE, TYPE_SHORT, 1, 8),
        entry(TAG_COMPRESSION, TYPE_SHORT, 1, 1),
        entry(TAG_PHOTOMETRIC, TYPE_SHORT, 1, 1),  # BlackIsZero
        entry(
            TAG_STRIP_OFFSETS,
            TYPE_LONG,
            n_strips,
            offsets[0] if n_strips == 1 else off_array_pos,
        ),
        entry(TAG_SAMPLES_PER_PIXEL, TYPE_SHORT, 1, 1),
        entry(TAG_ROWS_PER_STRIP, TYPE_LONG, 1, rows_per_strip),
        entry(
            TAG_STRIP_BYTE_COUNTS,
            TYPE_LONG,
            n_strips,
            counts[0] if n_strips == 1 else cnt_array_pos,
        ),
    ]
    out = bytearray()
    out += _MAGIC_LE + struct.pack("<I", ifd_pos)
    for s in strips:
        out += s
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *offsets)
        out += struct.pack(f"<{n_strips}I", *counts)
    out += struct.pack("<H", len(entries))
    for e in sorted(entries, key=lambda b: struct.unpack("<H", b[:2])[0]):
        out += e  # spec: entries sorted by tag
    out += struct.pack("<I", 0)  # next-IFD pointer: none
    return bytes(out)


def _read_values(blob: bytes, typ: int, count: int, field: bytes) -> list[int]:
    size = 2 if typ == TYPE_SHORT else 4
    fmt = "H" if typ == TYPE_SHORT else "I"
    total = size * count
    if total <= 4:
        return list(struct.unpack(f"<{count}{fmt}", field[:total]))
    (off,) = struct.unpack("<I", field)
    if off + total > len(blob):
        raise ValueError("TIFF value array out of bounds")
    return list(struct.unpack(f"<{count}{fmt}", blob[off : off + total]))


def decode_tiff(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an uncompressed 8-bit grayscale little-endian TIFF to
    ``(width, height, gray)`` with ``gray`` shaped (h, w) uint8."""
    if blob[:4] != _MAGIC_LE:
        raise ValueError("not a little-endian TIFF (bad magic)")
    if len(blob) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_pos,) = struct.unpack("<I", blob[4:8])
    if ifd_pos + 2 > len(blob):
        raise ValueError("IFD offset out of bounds")
    (n_entries,) = struct.unpack("<H", blob[ifd_pos : ifd_pos + 2])
    if n_entries > 256:
        raise ValueError("implausible IFD entry count")
    end = ifd_pos + 2 + 12 * n_entries
    if end + 4 > len(blob):
        raise ValueError("IFD out of bounds")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = blob[ifd_pos + 2 + 12 * i : ifd_pos + 2 + 12 * (i + 1)]
        tag, typ, count = struct.unpack("<HHI", e[:8])
        if typ not in (TYPE_SHORT, TYPE_LONG):
            continue  # types we never wrote; ignorable per spec
        if count > 1 << 20:
            raise ValueError("implausible tag count")
        tags[tag] = _read_values(blob, typ, count, e[8:12])

    def one(tag: int, default: int | None = None) -> int:
        if tag not in tags:
            if default is None:
                raise ValueError(f"missing required TIFF tag {tag}")
            return default
        return tags[tag][0]

    w, h = one(TAG_WIDTH), one(TAG_LENGTH)
    if one(TAG_COMPRESSION, 1) != 1:
        raise ValueError("unsupported TIFF compression")
    if one(TAG_BITS_PER_SAMPLE, 8) != 8 or one(TAG_SAMPLES_PER_PIXEL, 1) != 1:
        raise ValueError("unsupported TIFF sample layout")
    if one(TAG_PHOTOMETRIC, 1) not in (0, 1):
        raise ValueError("unsupported TIFF photometric interpretation")
    if w <= 0 or h <= 0 or w * h > 1 << 28:
        raise ValueError("implausible TIFF dimensions")
    offsets = tags.get(TAG_STRIP_OFFSETS)
    counts = tags.get(TAG_STRIP_BYTE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("missing/mismatched strip arrays")
    data = bytearray()
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(blob):
            raise ValueError("strip out of bounds")
        data += blob[off : off + cnt]
    if len(data) != w * h:
        raise ValueError(f"strip bytes {len(data)} != {w}x{h}")
    return w, h, np.frombuffer(bytes(data), dtype=np.uint8).reshape(h, w)
