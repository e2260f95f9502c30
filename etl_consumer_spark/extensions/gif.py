"""GIF87a codec in pure Python/NumPy: LZW with variable-width codes,
grayscale global color table, sub-block framing.

Implements the public GIF87a specification (CompuServe, 1987; the LZW
variant is the one described in the spec's Appendix and in ITU-T T.82's
references): codes start at ``min_code_size + 1`` bits (9 for 8-bit
pixels), grow by one bit whenever the next free code crosses a power of
two, cap at 12 bits, and a CLEAR code resets the table. Bit packing is
LSB-first; compressed bytes ride in ≤255-byte sub-blocks.

GIF is lossless over palette indices, and the encoder's palette is the
identity grayscale ramp (``palette[i] = (i, i, i)``), so decoded pixel
bytes equal the input raster bytes exactly — which is what lets the Spark
feature-extraction path over real GIF blobs be value-checked by a SQL
oracle that recomputes the statistics from the synthesis rule (the same
contract as the PPM/BMP/PNG/WAV codecs in this package).

No reference-repo analog: the reference (a Go CDC consumer, ~800 LoC) has
no media handling; this exists for the training-data-pipeline surface.
"""

from __future__ import annotations

import struct

import numpy as np

GIF87_MAGIC = b"GIF87a"
GIF89_MAGIC = b"GIF89a"

_MIN_CODE_SIZE = 8          # 8-bit palette indices
_CLEAR = 1 << _MIN_CODE_SIZE           # 256
_EOI = _CLEAR + 1                      # 257
_FIRST_FREE = _EOI + 1                 # 258
_MAX_CODE = 1 << 12                    # table capped at 4096 codes


class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> None:
        if self._nbits:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0


class _BitReaderLSB:
    """LSB-first variable-width code reader."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, width: int) -> int:
        while self._nbits < width:
            if self._pos >= len(self._data):
                raise ValueError("LZW stream truncated")
            self._acc |= self._data[self._pos] << self._nbits
            self._pos += 1
            self._nbits += 8
        code = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._nbits -= width
        return code


def _lzw_compress(data: bytes) -> bytes:
    w = _BitWriter()
    code_size = _MIN_CODE_SIZE + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << _MIN_CODE_SIZE)}
    next_code = _FIRST_FREE
    w.write(_CLEAR, code_size)
    prefix = b""
    for byte in data:
        probe = prefix + bytes([byte])
        if probe in table:
            prefix = probe
            continue
        w.write(table[prefix], code_size)
        if next_code < _MAX_CODE:
            table[probe] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by exactly one entry
            # (it adds after reading the code the encoder emitted when
            # adding), so the encoder grows its write width one addition
            # LATER than next_code crossing the power of two
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            # table full: emit CLEAR and start a fresh table (decoder resets
            # on the same code)
            w.write(_CLEAR, code_size)
            table = {bytes([i]): i for i in range(1 << _MIN_CODE_SIZE)}
            next_code = _FIRST_FREE
            code_size = _MIN_CODE_SIZE + 1
        prefix = bytes([byte])
    if prefix:
        w.write(table[prefix], code_size)
    w.write(_EOI, code_size)
    w.flush()
    return bytes(w.out)


def _lzw_decompress(data: bytes, expected: int) -> bytes:
    r = _BitReaderLSB(data)
    out = bytearray()
    code_size = _MIN_CODE_SIZE + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << _MIN_CODE_SIZE)]
    table += [b"", b""]  # CLEAR, EOI placeholders
    prev: bytes | None = None
    while len(out) < expected:
        code = r.read(code_size)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(1 << _MIN_CODE_SIZE)] + [b"", b""]
            code_size = _MIN_CODE_SIZE + 1
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code after CLEAR out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) != expected:
        raise ValueError(f"LZW decoded {len(out)} pixels, expected {expected}")
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Encode a 2D uint8 raster as a GIF87a with the identity grayscale
    palette (pixel value == palette index == gray level)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_gif expects a 2D uint8 raster")
    h, w = img.shape
    parts = [GIF87_MAGIC]
    # logical screen descriptor: GCT present, 8 bits/channel, 256 entries
    parts.append(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
    ramp = np.arange(256, dtype=np.uint8)
    parts.append(np.repeat(ramp, 3).tobytes())  # identity grayscale GCT
    # image descriptor at (0,0), no local table, not interlaced
    parts.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
    parts.append(bytes([_MIN_CODE_SIZE]))
    comp = _lzw_compress(img.tobytes())
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        parts.append(bytes([len(chunk)]) + chunk)
    parts.append(b"\x00\x3b")  # block terminator + trailer
    return b"".join(parts)


def decode_gif(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a (non-interlaced, single-image) GIF87a/89a to
    ``(width, height, rgb)`` where ``rgb`` is ``(h, w, 3)`` uint8 after
    palette mapping. 89a extension blocks are skipped; interlace and
    LZW framing errors raise ``ValueError`` — nothing is trusted from the
    headers without bounds checks."""
    if blob[:6] not in (GIF87_MAGIC, GIF89_MAGIC):
        raise ValueError("not a GIF (bad magic)")
    try:
        return _decode_gif(blob)
    except (IndexError, struct.error) as exc:  # truncated/corrupt framing
        raise ValueError(f"malformed GIF: {exc}") from exc


def _decode_gif(blob: bytes) -> tuple[int, int, np.ndarray]:
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8)
        if palette.size != 3 * n:
            raise ValueError("global color table truncated")
        palette = palette.reshape(n, 3)
        pos += 3 * n
    while pos < len(blob):
        block = blob[pos]
        if block == 0x21:  # 89a extension: label byte + sub-blocks
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, ipack = struct.unpack("<HHHHB", blob[pos + 1 : pos + 10])
            pos += 10
            if ipack & 0x40:
                raise ValueError("interlaced GIF not supported")
            if ipack & 0x80:
                n = 2 << (ipack & 0x07)
                palette = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8)
                if palette.size != 3 * n:
                    raise ValueError("local color table truncated")
                palette = palette.reshape(n, 3)
                pos += 3 * n
            if palette is None:
                raise ValueError("GIF image without a color table")
            min_code = blob[pos]
            if min_code != _MIN_CODE_SIZE:
                raise ValueError(f"only 8-bit LZW supported, got {min_code}")
            pos += 1
            comp = bytearray()
            while blob[pos] != 0:
                ln = blob[pos]
                comp += blob[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(_lzw_decompress(bytes(comp), w * h), dtype=np.uint8)
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("pixel index outside the color table")
            rgb = palette[idx.reshape(h, w)]
            return w, h, rgb
        elif block == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")
