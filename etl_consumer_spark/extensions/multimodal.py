"""Multimodal column support: images/audio/video as opaque binary columns
with typed metadata, plus the Spark-side plumbing for decode / feature
extraction / resize / frame sampling.

The decode layer is a REAL pure-Python codec per media type, implemented
from public specs: images — binary PPM (P6, netpbm docs), uncompressed
24-bit BMP (Windows BITMAPINFOHEADER layout), 8-bit truecolor PNG
(RFC 2083: chunk framing with CRC verification, all five filter types:
None/Sub/Up/Average/Paeth, stdlib-zlib inflate), baseline-sequential
grayscale JPEG (ITU-T T.81: marker framing, Annex-K Huffman tables,
DCT + quantization — see ``extensions/jpeg.py``); audio — RIFF/WAVE PCM
(``extensions/audio.py``); video — MJPEG-in-AVI (RIFF LIST tree walk +
per-frame JPEG decode, below). Kernels sniff the blob magic and parse
headers + raster from the bytes; nothing trusts the metadata column.
Formats needing real codec libraries (WebP, H.264...) are not present in
this container and remain a clearly-marked error boundary;
``deterministic_fake_decode`` is kept for unknown blobs so the plumbing
stays exercisable on any bytes.

Scale design: all kernels run through ``mapInPandas`` (Arrow batches, one
Python worker per core, no driver collect); inputs are repartitioned before
the kernel so a single-row-group parquet file can't pin the pipeline to one
task; metadata lives in a struct column so pruning works (a scan that only
needs ``meta.width`` never reads the blob bytes thanks to parquet column
pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # ppm|bmp|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def _spread(df: DataFrame, spread: bool = True) -> DataFrame:
    """Round-robin the frame out to session parallelism for a Python
    kernel (a raw few-row-group parquet scan would otherwise pin the
    kernel to a couple of tasks). ``spread=False`` is the CHAINED-call
    opt-out every ``extract_*`` function exposes: a synthesize → extract
    pipeline is already spread by the synthesize side and mapInPandas
    preserves partitioning, so a second round-robin re-shuffles the blob
    column — the widest payload in the whole family — for nothing
    between the two kernels (guide §2.1: remove shuffles outright; one
    blob exchange per extract_* call on every chained mm_* query). An
    explicit flag rather than a partition-count probe: probing via
    ``df.rdd`` physically plans (and codegen-compiles) the upstream
    subtree a second time — measured at ~+0.1 s per query build, which
    at sub-second local walls is itself a regression."""
    if not spread:
        return df
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


# ---------------------------------------------------------------------------
# Real pure-Python codecs: binary PPM (P6) and uncompressed 24-bit BMP.
# ---------------------------------------------------------------------------

def encode_ppm(raster: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → binary PPM (P6, maxval 255)."""
    h, w, c = raster.shape
    assert c == 3 and raster.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode("ascii") + raster.tobytes()


def decode_ppm(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary PPM (P6): magic, whitespace/comment-tolerant header
    tokens (width, height, maxval), one whitespace byte, raster of
    ``w*h*3`` bytes. Returns (width, height, raster (h, w, 3) uint8)."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    n = w * h * 3
    raster = np.frombuffer(blob, dtype=np.uint8, count=n, offset=pos)
    if raster.size != n:
        raise ValueError(f"truncated raster: want {n} bytes")
    return w, h, raster.reshape(h, w, 3)


def encode_bmp(raster: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding, BGR byte order)."""
    import struct

    h, w, c = raster.shape
    assert c == 3 and raster.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(raster[y, :, ::-1].tobytes() + pad)  # RGB -> BGR
    return header + info + b"".join(rows)


def decode_bmp(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an uncompressed 24-bit BMP. Returns (width, height,
    raster (h, w, 3) uint8, RGB order, top-down)."""
    import struct

    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    header_size, w, h_signed = struct.unpack_from("<Iii", blob, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h_signed > 0
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for row in range(h):
        src = data_offset + row * row_size
        bgr = np.frombuffer(blob, dtype=np.uint8, count=w * 3, offset=src).reshape(w, 3)
        y = (h - 1 - row) if bottom_up else row
        out[y] = bgr[:, ::-1]  # BGR -> RGB
    return w, h, out


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG filter 4): nearest of left/up/
    upper-left to p = a + b - c, ties resolved left, up, upper-left."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(raster: np.ndarray, filter_type: int = 0) -> bytes:
    """RGB uint8 array (h, w, 3) → non-interlaced 8-bit truecolor PNG,
    stdlib zlib only. ``filter_type`` selects the scanline filter applied
    to every row (0-4) so round-trip tests can exercise each decode path."""
    import zlib
    import struct

    h, w, c = raster.shape
    assert c == 3 and raster.dtype == np.uint8
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"PNG filter must be 0-4, got {filter_type}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, truecolor
    bpp = 3
    lines = []
    prior = np.zeros(w * bpp, dtype=np.int16)
    for y in range(h):
        raw = raster[y].reshape(-1).astype(np.int16)
        left = np.concatenate([np.zeros(bpp, np.int16), raw[:-bpp]])
        if filter_type == 0:
            filt = raw
        elif filter_type == 1:   # Sub
            filt = raw - left
        elif filter_type == 2:   # Up
            filt = raw - prior
        elif filter_type == 3:   # Average
            filt = raw - (left + prior) // 2
        else:                    # Paeth
            ul = np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]])
            filt = raw - _paeth_vec(left, prior, ul)
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prior = raw
    idat = zlib.compress(b"".join(lines))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an 8-bit non-interlaced truecolor PNG: verify chunk CRCs,
    inflate the concatenated IDAT stream with stdlib zlib, then undo the
    per-scanline filter (all five types). Returns (width, height,
    raster (h, w, 3) uint8)."""
    import struct
    import zlib

    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + ln)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit non-interlaced truecolor PNG supported "
                    f"(depth={depth}, color={color}, interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    bpp, stride = 3, w * 3 + 1
    if len(raw) != stride * h:
        raise ValueError(f"bad IDAT payload: want {stride * h} bytes, got {len(raw)}")
    out = np.empty((h, w * 3), dtype=np.uint8)
    prior = np.zeros(w * 3, dtype=np.int16)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ft = line[0]
        cur = np.frombuffer(line, dtype=np.uint8, offset=1).astype(np.int16)
        if ft == 0:
            recon = cur
        elif ft == 2:    # Up — no intra-row dependency, vectorized
            recon = (cur + prior) % 256
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth recurse on the reconstructed left pixel —
            # sequential in x by definition
            recon = np.empty(w * 3, dtype=np.int16)
            for x in range(w * 3):
                left = recon[x - bpp] if x >= bpp else 0
                up = int(prior[x])
                ul = int(prior[x - bpp]) if x >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                recon[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return w, h, out.reshape(h, w, 3)


def sniff_and_decode(blob: bytes) -> tuple[str, int, int, np.ndarray]:
    """Dispatch on magic bytes → (format, width, height, raster (h, w, 3))."""
    if blob[:2] == b"P6":
        w, h, px = decode_ppm(blob)
        return "ppm", w, h, px
    if blob[:2] == b"BM":
        w, h, px = decode_bmp(blob)
        return "bmp", w, h, px
    if blob[:8] == PNG_SIG:
        w, h, px = decode_png(blob)
        return "png", w, h, px
    if blob[:3] == b"\xff\xd8\xff":
        from etl_consumer_spark.extensions.jpeg import decode_jpeg

        w, h, gray = decode_jpeg(blob)
        # grayscale → replicated RGB so every codec shares one raster shape
        return "jpeg", w, h, np.repeat(gray[:, :, None], 3, axis=2)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        from etl_consumer_spark.extensions.gif import decode_gif

        w, h, rgb = decode_gif(blob)
        return "gif", w, h, rgb
    if blob[:4] == b"II\x2a\x00":
        from etl_consumer_spark.extensions.tiff import decode_tiff

        w, h, gray = decode_tiff(blob)
        return "tiff", w, h, np.repeat(gray[:, :, None], 3, axis=2)
    raise ValueError(f"unknown image magic {blob[:2]!r}")


def synthesize_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a media table of REAL binary-PPM blobs from any (id, string)
    source, entirely in Spark expressions (no Python in the plan):

    - width varies per row (``8 + length(payload) % 8``), height is 4;
    - the raster is the first ``w*4*3`` bytes of ``repeat(md5(payload), 6)``
      (hex chars — ASCII, so char count == byte count even for unicode
      payloads);
    - blob = ``"P6\\n{w} 4\\n255\\n"`` + raster.

    Deterministic and SQL-reproducible, which is what lets the decode
    kernels be oracle-checked value-for-value by DuckDB."""
    w = (F.length(payload_col) % 8 + 8).cast("int")
    raster = F.repeat(F.md5(F.col(payload_col).cast("binary")), 6).substr(
        F.lit(1), w * 12
    )
    header = F.concat(F.lit("P6\n"), w.cast("string"), F.lit(" 4\n255\n"))
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.concat(header, raster).cast("binary").alias("blob"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("ppm").alias("format"),
            w.alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def synthesize_png_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """PNG twin of :func:`synthesize_media_table`: the SAME deterministic
    raster (width ``8 + length(payload) % 8``, height 4, bytes = first
    ``w*12`` chars of ``repeat(md5(payload), 6)``), so the SAME SQL oracle
    verifies the decode value-for-value — but the blob is a real
    zlib-compressed PNG, built in a mapInPandas kernel (a DEFLATE stream
    can't be produced by SQL expressions). The scanline filter cycles with
    ``id % 5``, so a corpus exercises every PNG filter type."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["_payload"]
                w = 8 + len(payload) % 8
                hexes = (hashlib.md5(payload.encode()).hexdigest() * 6)[: w * 12]
                raster = np.frombuffer(hexes.encode("ascii"), dtype=np.uint8)
                blob = encode_png(raster.reshape(4, w, 3), filter_type=int(row["_id"]) % 5)
                out.append({"media_id": int(row["_id"]), "blob": blob, "w": w})
            yield pd.DataFrame(out, columns=["media_id", "blob", "w"])

    encoded = (
        df.select(F.col(id_col).alias("_id"), F.col(payload_col).alias("_payload"))
        .transform(_spread)
        .mapInPandas(kernel, "media_id long, blob binary, w int")
    )
    return encoded.select(
        "media_id",
        "blob",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("png").alias("format"),
            F.col("w").alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    ).drop("w")


def synthesize_jpeg_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """JPEG sibling of :func:`synthesize_png_media_table`: a real
    baseline-sequential JFIF blob per row, produced by the full encoder
    (DCT → quantize → zigzag → Huffman → byte-stuff) in a mapInPandas
    kernel. The raster is constant-per-8x8-block — 2x4 blocks whose values
    are the ascii codes of the first 8 md5(payload) hex chars — which the
    codec's DC-quant-8 design round-trips EXACTLY (see extensions/jpeg.py),
    so a pure-SQL oracle can value-check the decoded pixel statistics even
    though JPEG is lossy in general."""
    from etl_consumer_spark.extensions.jpeg import encode_jpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                hexes = hashlib.md5(row["_payload"].encode()).hexdigest()[:8]
                blocks = np.frombuffer(hexes.encode("ascii"), dtype=np.uint8)
                gray = np.kron(blocks.reshape(2, 4), np.ones((8, 8), dtype=np.uint8))
                out.append({"media_id": int(row["_id"]), "blob": encode_jpeg(gray)})
            yield pd.DataFrame(out, columns=["media_id", "blob"])

    encoded = (
        df.select(F.col(id_col).alias("_id"), F.col(payload_col).alias("_payload"))
        .transform(_spread)
        .mapInPandas(kernel, "media_id long, blob binary")
    )
    return encoded.select(
        "media_id",
        "blob",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("jpeg").alias("format"),
            F.lit(32).cast("int").alias("width"),
            F.lit(16).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def synthesize_gif_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """GIF twin of :func:`synthesize_png_media_table`: the SAME deterministic
    raster bytes (first ``w*12`` chars of ``repeat(md5(payload), 6)``,
    ``w = 8 + length(payload) % 8``), laid out as a ``(4, w*3)`` grayscale
    image (one pixel per raster byte). GIF's LZW over the identity
    grayscale palette is lossless, so the shared SQL oracle value-checks
    the LZW decompress + palette-map path exactly; pixel counts differ from
    the RGB twins (``w*12`` gray pixels vs ``w*4`` RGB pixels), which the
    oracle accounts for."""
    from etl_consumer_spark.extensions.gif import encode_gif

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["_payload"]
                w = 8 + len(payload) % 8
                hexes = (hashlib.md5(payload.encode()).hexdigest() * 6)[: w * 12]
                raster = np.frombuffer(hexes.encode("ascii"), dtype=np.uint8)
                blob = encode_gif(raster.reshape(4, w * 3))
                out.append({"media_id": int(row["_id"]), "blob": blob, "w": w})
            yield pd.DataFrame(out, columns=["media_id", "blob", "w"])

    encoded = (
        df.select(F.col(id_col).alias("_id"), F.col(payload_col).alias("_payload"))
        .transform(_spread)
        .mapInPandas(kernel, "media_id long, blob binary, w int")
    )
    return encoded.select(
        "media_id",
        "blob",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("gif").alias("format"),
            (F.col("w") * 3).alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    ).drop("w")


def synthesize_tiff_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """TIFF twin of :func:`synthesize_gif_media_table`: the SAME
    deterministic grayscale raster (``(4, w*3)``, one pixel per raster
    byte), written as a real multi-strip uncompressed TIFF 6.0 blob
    (``RowsPerStrip=2`` → two strips, so the IFD walk and the strip
    reassembly are genuinely exercised). Uncompressed strips are lossless,
    so the shared gray SQL oracle value-checks the decode exactly."""
    from etl_consumer_spark.extensions.tiff import encode_tiff

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["_payload"]
                w = 8 + len(payload) % 8
                hexes = (hashlib.md5(payload.encode()).hexdigest() * 6)[: w * 12]
                raster = np.frombuffer(hexes.encode("ascii"), dtype=np.uint8)
                blob = encode_tiff(raster.reshape(4, w * 3), rows_per_strip=2)
                out.append({"media_id": int(row["_id"]), "blob": blob, "w": w})
            yield pd.DataFrame(out, columns=["media_id", "blob", "w"])

    encoded = (
        df.select(F.col(id_col).alias("_id"), F.col(payload_col).alias("_payload"))
        .transform(_spread)
        .mapInPandas(kernel, "media_id long, blob binary, w int")
    )
    return encoded.select(
        "media_id",
        "blob",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("tiff").alias("format"),
            (F.col("w") * 3).alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    ).drop("w")


def synthesize_wav_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Audio leg of the media synthesis family: a real RIFF/WAVE PCM blob
    per row (see ``extensions/audio.py``). The signal is 32 int16 samples
    ``ascii(md5_hex_char_i) - 77`` — digits map negative, letters positive,
    so zero crossings genuinely occur — at 16 kHz mono. PCM is lossless, so
    the SQL oracle recomputes every decoded-sample statistic exactly."""
    from etl_consumer_spark.extensions.audio import encode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                hexes = hashlib.md5(row["_payload"].encode()).hexdigest()
                v = np.frombuffer(hexes.encode("ascii"), dtype=np.uint8).astype(np.int16) - 77
                out.append({"media_id": int(row["_id"]), "blob": encode_wav(v, 16000)})
            yield pd.DataFrame(out, columns=["media_id", "blob"])

    encoded = (
        df.select(F.col(id_col).alias("_id"), F.col(payload_col).alias("_payload"))
        .transform(_spread)
        .mapInPandas(kernel, "media_id long, blob binary")
    )
    return encoded.select(
        "media_id",
        "blob",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("wav").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(2).cast("long").alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_ms long, "
    "rms double, peak long, zero_crossings long"
)


def extract_audio_features(media: DataFrame, spread: bool = True) -> DataFrame:
    """Per-clip audio stats via mapInPandas: the WAV container is actually
    parsed (RIFF chunk walk, fmt validation) and features computed over the
    decoded PCM samples — duration, RMS, peak, zero-crossing count."""
    from etl_consumer_spark.extensions.audio import audio_features

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                feats = audio_features(bytes(row["blob"]))
                out.append(
                    {
                        "media_id": row["media_id"],
                        "sample_rate": feats["sample_rate"],
                        "n_samples": feats["n_samples"],
                        "duration_ms": feats["duration_ms"],
                        "rms": feats["rms"],
                        "peak": feats["peak"],
                        "zero_crossings": feats["zero_crossings"],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_ms",
                    "rms", "peak", "zero_crossings",
                ],
            )

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


DOWNSAMPLE_SCHEMA = (
    "media_id long, out_rate int, n_out long, sum_abs long, peak long, ds_md5 string"
)


def downsample_audio(media: DataFrame, factor: int = 2, spread: bool = True) -> DataFrame:
    """Integer 2-tap box-filter decimation through the real WAV decode:
    out[k] = sum of each ``factor``-sample block (exact integer — the
    anti-alias accumulate WITHOUT the divide, so no rounding policy can
    diverge between engines); tail samples short of a full block are
    dropped. The sample-rate-normalization pass of a speech pipeline.
    Returns exact integer stats and an md5 over the decimated sequence so
    a SQL oracle verifies the resample bit-for-bit."""
    import hashlib

    from etl_consumer_spark.extensions.audio import decode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                rate, samples = decode_wav(bytes(row["blob"]))
                n = (len(samples) // factor) * factor
                blocks = samples[:n].astype(np.int64).reshape(-1, factor).sum(axis=1)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "out_rate": int(rate // factor),
                        "n_out": int(blocks.size),
                        "sum_abs": int(np.abs(blocks).sum()),
                        "peak": int(np.abs(blocks).max()) if blocks.size else 0,
                        "ds_md5": hashlib.md5(
                            ",".join(str(int(v)) for v in blocks).encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "out_rate", "n_out", "sum_abs", "peak", "ds_md5"],
            )

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, DOWNSAMPLE_SCHEMA
    )


AUDIO_FRAME_SCHEMA = "media_id long, frame_idx int, energy_sum long"


def extract_audio_frames(media: DataFrame, frame_size: int = 8, spread: bool = True) -> DataFrame:
    """Per-frame energy through the real WAV decode: the RIFF chunk walk +
    PCM decode runs in the Arrow kernel, emitting one row per
    ``frame_size``-sample frame with the EXACT integer energy sum
    (sum of squared samples) — everything downstream (thresholding,
    segmentation) stays JVM-side and SQL-checkable. Ragged tails are
    dropped (whole frames only), matching the usual hop-aligned framing."""
    from etl_consumer_spark.extensions.audio import decode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                _, samples = decode_wav(bytes(row["blob"]))
                n = (len(samples) // frame_size) * frame_size
                fr = samples[:n].astype(np.int64).reshape(-1, frame_size)
                for i, e in enumerate((fr * fr).sum(axis=1)):
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "energy_sum": int(e),
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "energy_sum"])

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, AUDIO_FRAME_SCHEMA
    )


AUDIO_CLIP_SCHEMA = (
    "media_id long, n_samples long, n_clipped long, dc_sum long, peak_abs long"
)


def audio_clip_stats(media: DataFrame, threshold: int = 28, spread: bool = True) -> DataFrame:
    """Clipping / DC-offset audio QA through the real WAV decode: count
    samples at or beyond ``threshold`` absolute amplitude (the clipped
    tally a loudness-normalization pass gates on), the exact integer DC
    sum (a nonzero mean betrays a miswired ADC or a bad decode), and the
    absolute peak. All outputs exact integers over the decoded PCM, so a
    SQL oracle can replay them value-for-value."""
    from etl_consumer_spark.extensions.audio import decode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                _, samples = decode_wav(bytes(row["blob"]))
                s = samples.astype(np.int64)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_samples": int(s.size),
                        "n_clipped": int((np.abs(s) >= threshold).sum()),
                        "dc_sum": int(s.sum()),
                        "peak_abs": int(np.abs(s).max()) if s.size else 0,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_samples", "n_clipped", "dc_sum", "peak_abs"],
            )

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, AUDIO_CLIP_SCHEMA
    )


def synthesize_letterboxed_media_table(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """Letterboxed twin of :func:`synthesize_media_table`: same
    deterministic 4-row PPM raster, but for every third id (``id % 3 = 0``)
    the top and bottom rows are replaced by a CONSTANT row (the first hex
    char of the payload md5 repeated across the full ``w*3`` bytes) — a
    real letterbox/pillarbox bar. Pure Spark string expressions, so the
    construction (and therefore any detector run on it) is replayable in
    SQL byte-for-byte."""
    w = (F.length(payload_col) % 8 + 8).cast("int")
    hexes = F.md5(F.col(payload_col).cast("binary"))
    full = F.repeat(hexes, 6).substr(F.lit(1), w * 12)
    row_len = w * 3
    border = F.repeat(hexes.substr(1, 1), row_len)
    lb = F.col(id_col) % 3 == 0
    raster = F.concat(
        F.when(lb, border).otherwise(full.substr(F.lit(1), row_len)),
        F.substring(full, row_len + 1, row_len * 2),
        F.when(lb, border).otherwise(
            F.substring(full, row_len * 3 + 1, row_len)
        ),
    )
    header = F.concat(F.lit("P6\n"), w.cast("string"), F.lit(" 4\n255\n"))
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.concat(header, raster).cast("binary").alias("blob"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("ppm").alias("format"),
            w.alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


LETTERBOX_SCHEMA = (
    "media_id long, width int, height int, top_rows int, bottom_rows int, "
    "letterboxed int"
)


def letterbox_stats(media: DataFrame, spread: bool = True) -> DataFrame:
    """Letterbox detection through the real PPM decode: a row is uniform
    when every byte of the decoded ``(w, 3)`` row equals its first byte
    (all channels, all columns). ``top_rows`` counts leading uniform rows,
    ``bottom_rows`` trailing uniform rows over what the top didn't consume
    (an all-uniform frame is all top, bottom 0), and the letterbox flag
    requires bars on BOTH edges — the crop-before-embed QA gate of a
    vision-training pipeline."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                w, h, raster = decode_ppm(bytes(row["blob"]))
                flat = raster.reshape(h, w * 3)
                uniform = [bool((r == r[0]).all()) for r in flat]
                top = 0
                while top < h and uniform[top]:
                    top += 1
                bottom = 0
                while bottom < h - top and uniform[h - 1 - bottom]:
                    bottom += 1
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": int(w),
                        "height": int(h),
                        "top_rows": top,
                        "bottom_rows": bottom,
                        "letterboxed": int(top > 0 and bottom > 0),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "top_rows", "bottom_rows",
                    "letterboxed",
                ],
            )

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, LETTERBOX_SCHEMA
    )


EQUALIZE_SCHEMA = "media_id long, n_px long, n_levels int, sum_eq long, eq_md5 string"


def equalize_images(media: DataFrame, spread: bool = True) -> DataFrame:
    """Histogram equalization through the real decode: the classic exact
    integer mapping h(v) = (cdf(v) - cdf_min) * 255 // (n - cdf_min)
    (floor division — no floats anywhere), applied per image. Returns the
    equalized pixel SUM and an md5 over the equalized sequence in pixel
    order, so a SQL oracle can verify the remap bit-for-bit. Flat images
    (one level) map to 0 by convention."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                gray, flat = _decode_gray_and_flat(row)
                flat = flat.astype(np.int64)
                vals, counts = np.unique(flat, return_counts=True)
                cdf = counts.cumsum()
                n = int(flat.size)
                cdf_min = int(cdf[0])
                if n == cdf_min:
                    eq_of = {int(vals[0]): 0}
                else:
                    eq = (cdf - cdf_min) * 255 // (n - cdf_min)
                    eq_of = {int(v): int(e) for v, e in zip(vals, eq)}
                eq_seq = [eq_of[int(v)] for v in flat]
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_px": n,
                        "n_levels": int(len(vals)),
                        "sum_eq": int(sum(eq_seq)),
                        "eq_md5": hashlib.md5(
                            ",".join(str(e) for e in eq_seq).encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_px", "n_levels", "sum_eq", "eq_md5"]
            )

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, EQUALIZE_SCHEMA
    )


SOBEL_SCHEMA = "media_id long, n_interior long, grad_sum long, grad_md5 string"


def sobel_edges(media: DataFrame, spread: bool = True) -> DataFrame:
    """Sobel gradient magnitude (|Gx| + |Gy|, the integer L1 form) over the
    interior pixels of the grayscale plane, through the real decode — the
    edge-energy/blur-detection feature of a vision-data QA pass. All
    arithmetic exact integers; returns the interior gradient SUM and an
    md5 over the row-major gradient sequence so a SQL oracle can verify
    the convolution value-for-value."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                gray, _ = _decode_gray_and_flat(row)
                g = gray.astype(np.int64)
                # valid 3x3 interior; Gx/Gy via shifted slices, no float path
                c = g[1:-1, 1:-1]  # noqa: F841 — center unused by Sobel
                gx = (
                    -g[:-2, :-2] + g[:-2, 2:]
                    - 2 * g[1:-1, :-2] + 2 * g[1:-1, 2:]
                    - g[2:, :-2] + g[2:, 2:]
                )
                gy = (
                    -g[:-2, :-2] - 2 * g[:-2, 1:-1] - g[:-2, 2:]
                    + g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:]
                )
                mag = np.abs(gx) + np.abs(gy)
                seq = mag.reshape(-1)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_interior": int(seq.size),
                        "grad_sum": int(seq.sum()),
                        "grad_md5": hashlib.md5(
                            ",".join(str(int(v)) for v in seq).encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_interior", "grad_sum", "grad_md5"]
            )

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, SOBEL_SCHEMA
    )


LAPLACIAN_SCHEMA = (
    "media_id long, n_interior long, lap_sum long, lap_sq_sum long, lap_md5 string"
)


def laplacian_stats(media: DataFrame, spread: bool = True) -> DataFrame:
    """4-neighbour Laplacian response over the 3x3-valid interior of the
    grayscale plane, through the real decode — the variance-of-Laplacian
    blur detector (Pech-Pacheco et al., ICPR'00) every vision-data QA pass
    runs before training. All arithmetic exact integers (signed response
    sum + squared-response sum), so a SQL oracle can replay the 5-tap
    convolution and the downstream variance is one shared float
    expression over two exact longs."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                gray, _ = _decode_gray_and_flat(row)
                g = gray.astype(np.int64)
                lap = (
                    g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:]
                    - 4 * g[1:-1, 1:-1]
                )
                seq = lap.reshape(-1)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_interior": int(seq.size),
                        "lap_sum": int(seq.sum()),
                        "lap_sq_sum": int((seq * seq).sum()),
                        "lap_md5": hashlib.md5(
                            ",".join(str(int(v)) for v in seq).encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_interior", "lap_sum", "lap_sq_sum", "lap_md5",
                ],
            )

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, LAPLACIAN_SCHEMA
    )


SSIM_SCHEMA = (
    "media_id long, n long, sx long, sy long, "
    "sxx long, syy long, sxy long, blur_md5 string"
)


def ssim_self_blur_stats(media: DataFrame, spread: bool = True) -> DataFrame:
    """Exact-integer SSIM inputs between the grayscale plane X and its
    3x3 integer box blur Y = floor(neighborhood_sum / 9), over the
    3x3-valid interior — the reference-vs-degraded quality comparison
    (Wang et al., IEEE TIP 2004) every image-processing QA loop runs.
    The kernel ships only EXACT integer sums (n, sum x, sum y, sum x^2,
    sum y^2, sum xy) plus an md5 of the blurred sequence, so the SSIM
    value itself is one shared float expression downstream and a SQL
    oracle can replay the blur tap-for-tap."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                gray, _ = _decode_gray_and_flat(row)
                g = gray.astype(np.int64)
                box = (
                    g[:-2, :-2] + g[:-2, 1:-1] + g[:-2, 2:]
                    + g[1:-1, :-2] + g[1:-1, 1:-1] + g[1:-1, 2:]
                    + g[2:, :-2] + g[2:, 1:-1] + g[2:, 2:]
                )
                y = box // 9
                x = g[1:-1, 1:-1]
                xs, ys = x.reshape(-1), y.reshape(-1)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n": int(xs.size),
                        "sx": int(xs.sum()),
                        "sy": int(ys.sum()),
                        "sxx": int((xs * xs).sum()),
                        "syy": int((ys * ys).sum()),
                        "sxy": int((xs * ys).sum()),
                        "blur_md5": hashlib.md5(
                            ",".join(str(int(v)) for v in ys).encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n", "sx", "sy", "sxx", "syy", "sxy", "blur_md5"],
            )

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, SSIM_SCHEMA
    )


TILES_SCHEMA = (
    "media_id long, n_tiles long, tile_sum_total long, "
    "max_tile_sum long, min_tile_sum long, tiles_md5 string"
)


def patch_tiles(media: DataFrame, patch: int = 2, spread: bool = True) -> DataFrame:
    """Non-overlapping patch extraction over the grayscale plane (the
    ViT-style patchification step of a vision-training pipeline), through
    the real decode: the image splits into floor(h/p) x floor(w/p) patches
    of p x p pixels (right/bottom remainders dropped, the standard crop),
    each summarized by its exact integer pixel sum; the md5 covers the
    row-major patch-sum sequence so a SQL oracle can replay the index
    arithmetic value-for-value. Map-only at any scale."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                gray, _ = _decode_gray_and_flat(row)
                g = gray.astype(np.int64)
                h, w = g.shape
                th, tw = h // patch, w // patch
                crop = g[: th * patch, : tw * patch]
                sums = (
                    crop.reshape(th, patch, tw, patch)
                    .sum(axis=(1, 3))
                    .reshape(-1)
                )
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_tiles": int(sums.size),
                        "tile_sum_total": int(sums.sum()),
                        "max_tile_sum": int(sums.max()),
                        "min_tile_sum": int(sums.min()),
                        "tiles_md5": hashlib.md5(
                            ",".join(str(int(v)) for v in sums).encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_tiles", "tile_sum_total",
                    "max_tile_sum", "min_tile_sum", "tiles_md5",
                ],
            )

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, TILES_SCHEMA
    )


def _real_compressed_decode_available() -> bool:
    try:  # pragma: no cover - container has no codec libs
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def deterministic_fake_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    """Reproducible stand-in for unknown formats: seeds a counter pattern
    from the blob's first bytes; shape (height, width) uint8."""
    seed = int.from_bytes((blob or b"\x00")[:4].ljust(4, b"\x00"), "big")
    base = np.arange(width * height, dtype=np.uint64) + seed
    return (base % 251).astype(np.uint8).reshape(height, width)


def _decode_gray_and_flat(row) -> tuple[np.ndarray, np.ndarray]:
    """(2D grayscale plane, flat raster bytes) for one media row: real codec
    when the magic is known, deterministic fake otherwise."""
    blob = bytes(row["blob"])
    try:
        _, w, h, px = sniff_and_decode(blob)
        return px[:, :, 0], px.reshape(-1)
    except ValueError:
        meta = row["meta"]
        px2 = deterministic_fake_decode(blob, meta["width"], meta["height"])
        return px2, px2.reshape(-1)


FEATURE_SCHEMA = "media_id long, mean_px double, std_px double, n_px long"


def extract_image_features(media: DataFrame, use_real_codec: bool = True, spread: bool = True) -> DataFrame:
    """Per-image brightness stats via mapInPandas (Arrow-batched): the blob
    is actually parsed (PPM/BMP header + raster), stats are over the raster
    bytes, ``n_px`` is the parsed pixel count.

    ``use_real_codec=False`` forces the fake decoder (legacy plumbing test
    mode). Remaining compressed formats (WebP/video) would require real
    codec libraries — not in this container — and raise
    ``NotImplementedError`` at the boundary."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if use_real_codec:
                    gray, flat = _decode_gray_and_flat(row)
                    n_px = gray.size
                else:
                    meta = row["meta"]
                    gray = deterministic_fake_decode(bytes(row["blob"]), meta["width"], meta["height"])
                    flat, n_px = gray.reshape(-1), gray.size
                # exact integer sums first, one shared float expression after:
                # bit-identical across engines (a running float mean/Welford
                # std would differ in the last ulp from a SQL oracle)
                s = int(flat.sum(dtype=np.int64))
                sq = int((flat.astype(np.int64) ** 2).sum(dtype=np.int64))
                n = flat.size
                mean = s / n
                std = math.sqrt(sq / n - (s / n) * (s / n))
                out.append(
                    {
                        "media_id": row["media_id"],
                        "mean_px": mean,
                        "std_px": std,
                        "n_px": int(n_px),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "mean_px", "std_px", "n_px"])

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(kernel, FEATURE_SCHEMA)


METADATA_SCHEMA = "media_id long, format string, width int, height int, n_raster long"


def extract_metadata(media: DataFrame, spread: bool = True) -> DataFrame:
    """Header-only parse: (format, width, height, raster byte count) read
    from the blob bytes — nothing copied from the meta column, so an oracle
    that recomputes the construction verifies the parser end-to-end."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                fmt, w, h, px = sniff_and_decode(bytes(row["blob"]))
                out.append(
                    {
                        "media_id": row["media_id"],
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "n_raster": int(px.size),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "format", "width", "height", "n_raster"])

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(kernel, METADATA_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, resized binary"


def resize_images(media: DataFrame, target_w: int, target_h: int, spread: bool = True) -> DataFrame:
    """Nearest-neighbor resize on the decoded grayscale plane; returns the
    new byte blob. Blob-in/blob-out kernel plumbing over the real codec."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                gray, _ = _decode_gray_and_flat(row)
                ys = (np.arange(target_h) * gray.shape[0] // target_h).clip(0, gray.shape[0] - 1)
                xs = (np.arange(target_w) * gray.shape[1] // target_w).clip(0, gray.shape[1] - 1)
                resized = gray[np.ix_(ys, xs)]
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": target_w,
                        "height": target_h,
                        "resized": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "resized"])

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(kernel, RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_hash string"


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 5, spread: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video-shaped blobs: frame ``i`` is the
    decoded raster rolled right by ``i*every_n`` bytes, md5-hashed. The
    roll-of-raster construction is SQL-expressible (string rotation of the
    raster slice), so frame hashes are oracle-checked exactly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                _, flat = _decode_gray_and_flat(row)
                for i in range(max_frames):
                    frame = np.roll(flat, i * every_n)
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "frame_hash": hashlib.md5(frame.tobytes()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_hash"])

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(kernel, FRAME_SCHEMA)


AHASH_SCHEMA = "media_id long, ahash string"

# fixed-point DCT-II cosine table for the pHash kernel: C[u][i] =
# round(cos((2i+1)*u*pi/16) * 10000). Integer taps make the transform
# order-insensitive and bit-reproducible, so a SQL oracle can replay it
# from the same literal table. Computed once at import from the same
# formula the oracle generator uses.
import math as _math

PHASH_DCT = [
    [int(round(_math.cos((2 * i + 1) * u * _math.pi / 16) * 10000)) for i in range(8)]
    for u in range(8)
]

PHASH_SCHEMA = "media_id long, phash string"


def phash_images(media: DataFrame, grid: int = 8, spread: bool = True) -> DataFrame:
    """Perceptual DCT-hash (pHash) per image: grayscale, nearest-neighbor
    ``grid``x``grid`` cells (same downsample as :func:`ahash_images`),
    then a 2-D fixed-point DCT-II — F[u][v] = sum_ij cell[i][j] *
    C[u][i] * C[v][j] with the integer tap table ``PHASH_DCT`` — and one
    bit per low-frequency coefficient: the 15 coefficients with
    u, v < 4 excluding DC, set iff the coefficient exceeds their 8th
    smallest (the exact-median threshold). Robust to the uniform
    brightness/contrast shifts that flip aHash bits, because the
    comparison is against the coefficients' own median, not a pixel mean.

    All-integer arithmetic end to end (cells <= 255, taps <= 1e4, sums
    <= 64 * 255 * 1e8 < 2^62), so the hash is bit-reproducible and the
    SQL oracle replays transform + threshold value-exactly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctab = np.array(PHASH_DCT, dtype=np.int64)
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                gray, _ = _decode_gray_and_flat(row)
                h, w = gray.shape
                ys = (np.arange(grid) * h // grid).clip(0, h - 1)
                xs = (np.arange(grid) * w // grid).clip(0, w - 1)
                cells = gray[np.ix_(ys, xs)].astype(np.int64)
                coef = ctab @ cells @ ctab.T  # F[u][v], exact int64
                lows = [
                    int(coef[u, v])
                    for u in range(4)
                    for v in range(4)
                    if not (u == 0 and v == 0)
                ]
                m = sorted(lows)[7]  # 8th smallest of 15
                out.append(
                    {
                        "media_id": row["media_id"],
                        "phash": "".join("1" if c > m else "0" for c in lows),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(kernel, PHASH_SCHEMA)


def ahash_images(media: DataFrame, grid: int = 8, spread: bool = True) -> DataFrame:
    """Perceptual average-hash (aHash) per image: the decoded grayscale
    plane is nearest-neighbor downsampled to a ``grid``x``grid`` cell
    matrix, each cell becomes one bit — 1 iff the cell is >= the mean of
    the grid — and the bits are emitted row-major as a '0'/'1' string.

    The threshold is computed in EXACT integer arithmetic
    (``v * grid^2 >= sum(cells)``, no float mean), so an independent SQL
    oracle reproduces the hash bit-for-bit from the synthesis rule.
    Identical images always collide; the hash is a stable 64-bit content
    key for image-level dedup, grouped/joined JVM-side downstream (the
    Python kernel only decodes + hashes — one Arrow batch pass, no
    per-image driver work)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                gray, _ = _decode_gray_and_flat(row)
                h, w = gray.shape
                ys = (np.arange(grid) * h // grid).clip(0, h - 1)
                xs = (np.arange(grid) * w // grid).clip(0, w - 1)
                cells = gray[np.ix_(ys, xs)].astype(np.int64)
                total = int(cells.sum())
                bits = (cells.reshape(-1) * grid * grid >= total).astype(np.uint8)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "ahash": "".join("1" if b else "0" for b in bits),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    return media.select("media_id", "blob", "meta").transform(lambda d: _spread(d, spread)).mapInPandas(kernel, AHASH_SCHEMA)


# ---------------------------------------------------------------------------
# Video (round 4): MJPEG-in-AVI. AVI is a RIFF container (the format the
# audio codec already walks) whose 'movi' LIST holds one '00dc' chunk per
# frame; Motion-JPEG frames are plain baseline JPEGs (the codec
# extensions/jpeg.py implements). Composing the two gives the engine a REAL
# video path — container parse + frame extraction + image decode — with no
# codec libraries. Structure written: RIFF('AVI ') / LIST('hdrl') with avih
# + one video strl(strh+strf) / LIST('movi') with '00dc' frames.
# ---------------------------------------------------------------------------

def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Grayscale uint8 frames (h, w) -> minimal MJPEG AVI bytes."""
    import struct

    from etl_consumer_spark.extensions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    blobs = [encode_jpeg(f) for f in frames]

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    max_bytes = max(len(b) for b in blobs)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec
        0, 0x10,           # padding, flags (AVIF_HASINDEX off, keep simple)
        len(blobs), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(blobs), max_bytes, 0, 0, 0)
    )
    # BITMAPINFOHEADER for MJPG
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", b) for b in blobs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi_mjpeg(blob: bytes) -> tuple[int, int, int, list[np.ndarray]]:
    """MJPEG AVI bytes -> (n_frames, width, height, frames).

    Walks the RIFF tree from the bytes (nothing trusted from metadata):
    finds the 'movi' LIST, decodes every '00dc' chunk through the baseline
    JPEG decoder. Raises ValueError on non-AVI/truncated input."""
    import struct

    from etl_consumer_spark.extensions.jpeg import decode_jpeg

    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = blob[pos : pos + 4]
            (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
            payload_start = pos + 8
            if payload_start + size > len(blob):
                raise ValueError("AVI chunk truncated")
            if cid == b"LIST":
                ltype = blob[payload_start : payload_start + 4]
                if ltype in (b"movi", b"hdrl", b"strl"):
                    walk(payload_start + 4, payload_start + size)
            elif cid == b"00dc":
                w, h, px = decode_jpeg(blob[payload_start : payload_start + size])
                frames.append(px)
            pos = payload_start + size + (size & 1)

    walk(12, len(blob))
    if not frames:
        raise ValueError("AVI contains no 00dc frames")
    h, w = frames[0].shape
    return len(frames), w, h, frames


def synthesize_avi_media_table(
    df: DataFrame, id_col: str, payload_col: str, n_frames: int = 2
) -> DataFrame:
    """Video leg of the media synthesis family: a real MJPEG AVI with
    ``n_frames`` frames (<= 4 — md5's 32 hex chars) per row. Frame f's
    raster is constant-per-8x8-block from md5 hex chars 8*f..8*f+7 (the
    JPEG codec's exact-roundtrip class), so a SQL oracle can value-check
    per-frame statistics through the full container-walk + entropy-decode
    path."""
    from etl_consumer_spark.extensions.jpeg import encode_jpeg  # noqa: F401

    assert 1 <= n_frames <= 4, "md5 hex supplies at most 4 x 8 block chars"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                hexes = hashlib.md5(row["_payload"].encode()).hexdigest()
                frames = []
                for f in range(n_frames):
                    blocks = np.frombuffer(
                        hexes[8 * f : 8 * f + 8].encode("ascii"), dtype=np.uint8
                    )
                    frames.append(
                        np.kron(blocks.reshape(2, 4), np.ones((8, 8), dtype=np.uint8))
                    )
                out.append(
                    {"media_id": int(row["_id"]), "blob": encode_avi_mjpeg(frames)}
                )
            yield pd.DataFrame(out, columns=["media_id", "blob"])

    encoded = (
        df.select(F.col(id_col).alias("_id"), F.col(payload_col).alias("_payload"))
        .transform(_spread)
        .mapInPandas(kernel, "media_id long, blob binary")
    )
    return encoded.select(
        "media_id",
        "blob",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("avi").alias("format"),
            F.lit(32).cast("int").alias("width"),
            F.lit(16).cast("int").alias("height"),
            F.lit(200).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


VIDEO_FEATURE_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, mean_px double, n_px long"
)


def extract_video_frame_features(media: DataFrame, spread: bool = True) -> DataFrame:
    """Per-frame brightness stats through the REAL container + codec path:
    RIFF walk -> 00dc chunks -> baseline JPEG decode -> integer-exact
    mean over the frame raster."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                n, w, h, frames = decode_avi_mjpeg(bytes(row["blob"]))
                for i, fr in enumerate(frames):
                    flat = fr.reshape(-1).astype(np.int64)
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "width": w,
                            "height": h,
                            "mean_px": int(flat.sum()) / flat.size,
                            "n_px": int(flat.size),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "width", "height", "mean_px", "n_px"],
            )

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(kernel, VIDEO_FEATURE_SCHEMA)


RASTER_HIST_SCHEMA = "media_id long, v int, cnt long"


def raster_value_counts(media: DataFrame, spread: bool = True) -> DataFrame:
    """Exact per-image byte-value histogram through the real PPM decode:
    one (media_id, value, count) row per distinct raster byte value —
    the input shared by entropy, equalization, and posterization QA.
    Counts are exact integers, so everything derived stays SQL-checkable;
    output size is bounded by 256 levels per image regardless of raster
    size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                _, _, raster = decode_ppm(bytes(row["blob"]))
                vals, cnts = np.unique(raster.reshape(-1), return_counts=True)
                for v, c in zip(vals.tolist(), cnts.tolist()):
                    out.append({"media_id": row["media_id"], "v": int(v), "cnt": int(c)})
            yield pd.DataFrame(out, columns=["media_id", "v", "cnt"])

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, RASTER_HIST_SCHEMA
    )


QUADRANT_SCHEMA = "media_id long, quadrant int, px_sum long, n_bytes long"


def raster_quadrant_sums(media: DataFrame, spread: bool = True) -> DataFrame:
    """Integral-image quadrant statistics through the real PPM decode:
    the raster is split into 4 quadrants (top/bottom half-rows x
    left/right half-columns, odd widths giving the right half the extra
    column) and each emits its exact integer byte sum — the O(1)-per-
    region box-sum reads an integral image (Viola & Jones, CVPR 2001)
    exists to provide, here at the coarsest 2x2 grid. Brightness
    asymmetry between quadrants is the vignetting/half-frame-corruption
    QA gate; 4 rows per image regardless of raster size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                w, h, raster = decode_ppm(bytes(row["blob"]))
                a = raster.reshape(h, w, 3).astype(np.int64)
                hw, hh = w // 2, h // 2
                quads = [
                    a[:hh, :hw],
                    a[:hh, hw:],
                    a[hh:, :hw],
                    a[hh:, hw:],
                ]
                for q, block in enumerate(quads):
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "quadrant": q,
                            "px_sum": int(block.sum()),
                            "n_bytes": int(block.size),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "quadrant", "px_sum", "n_bytes"]
            )

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, QUADRANT_SCHEMA
    )


RLE_SCHEMA = "media_id long, n_bytes long, n_runs long, max_run long"


def raster_run_lengths(media: DataFrame, spread: bool = True) -> DataFrame:
    """Run-length statistics through the real PPM decode: number of
    maximal equal-byte runs and the longest run per raster. A
    posterized/banded image (or a constant corrupt frame) collapses to
    few long runs — the compressibility QA signal RLE-era codecs (PCX,
    TGA; Golomb 1966 for the run-length coding theory) exploit, read
    here as n_runs/n_bytes. Bounded output: one row per image; the
    per-image cost is one vectorized np.diff pass over the raster."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                _, _, raster = decode_ppm(bytes(row["blob"]))
                a = raster.reshape(-1)
                if a.size == 0:
                    out.append(
                        {"media_id": row["media_id"], "n_bytes": 0, "n_runs": 0, "max_run": 0}
                    )
                    continue
                changes = np.nonzero(np.diff(a.astype(np.int16)))[0]
                bounds = np.concatenate(([-1], changes, [a.size - 1]))
                lens = np.diff(bounds)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_bytes": int(a.size),
                        "n_runs": int(lens.size),
                        "max_run": int(lens.max()),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "n_bytes", "n_runs", "max_run"])

    return media.select("media_id", "blob").transform(lambda d: _spread(d, spread)).mapInPandas(
        kernel, RLE_SCHEMA
    )
