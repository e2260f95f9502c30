"""Multimodal column support: images/audio/video as opaque binary columns
with typed metadata, plus the Spark-side plumbing for decode / feature
extraction / resize / frame sampling.

The container has no image/audio codec libraries, so the *decode kernels*
are stubbed: ``deterministic_fake_decode`` produces a reproducible byte
pattern (so the plumbing — schema, Arrow batch shape, partitioning — is
fully testable), and the real-codec path raises ``NotImplementedError``
behind an import-try (SURVEY §7 Phase 5 mandate).

Scale design: all kernels run through ``mapInPandas`` (Arrow batches, one
Python worker per core, no driver collect); metadata lives in a struct
column so pruning works (a scan that only needs ``meta.width`` never reads
the blob bytes thanks to parquet column pruning).
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
        T.StructField("format", T.StringType()),       # png|jpeg|wav|mp4|...
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


def synthesize_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a media-shaped table from any (id, string) source — the blob is
    the utf-8 payload bytes; metadata is derived deterministically. Used to
    exercise the pipeline without real codecs."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("blob"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.length(payload_col) % 64 + 16).cast("int").alias("width"),
            (F.length(payload_col) % 48 + 16).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _real_image_decode_available() -> bool:
    try:  # pragma: no cover - container has no codec libs
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def deterministic_fake_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    """Reproducible stand-in for an image decoder: seeds a counter pattern
    from the blob's first bytes; shape (height, width) uint8."""
    seed = int.from_bytes((blob or b"\x00")[:4].ljust(4, b"\x00"), "big")
    base = np.arange(width * height, dtype=np.uint64) + seed
    return (base % 251).astype(np.uint8).reshape(height, width)


FEATURE_SCHEMA = "media_id long, mean_px double, std_px double, n_px long"


def extract_image_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Per-image brightness stats via mapInPandas (Arrow-batched).

    With ``use_real_codec=True`` and no codec library installed this raises
    ``NotImplementedError`` — the clearly-marked stub boundary."""
    if use_real_codec and not _real_image_decode_available():
        raise NotImplementedError(
            "real image decode requires PIL/opencv, not present in this "
            "container; use use_real_codec=False for the deterministic stub"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                px = deterministic_fake_decode(row["blob"], meta["width"], meta["height"])
                out.append(
                    {
                        "media_id": row["media_id"],
                        "mean_px": float(px.mean()),
                        "std_px": float(px.std()),
                        "n_px": int(px.size),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "mean_px", "std_px", "n_px"])

    par = media.sparkSession.sparkContext.defaultParallelism
    return media.select("media_id", "blob", "meta").repartition(par).mapInPandas(kernel, FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, resized binary"


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize on the fake-decoded pixels; returns the new
    byte blob. Demonstrates blob-in/blob-out kernel plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                px = deterministic_fake_decode(row["blob"], meta["width"], meta["height"])
                ys = (np.arange(target_h) * px.shape[0] // target_h).clip(0, px.shape[0] - 1)
                xs = (np.arange(target_w) * px.shape[1] // target_w).clip(0, px.shape[1] - 1)
                resized = px[np.ix_(ys, xs)]
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": target_w,
                        "height": target_h,
                        "resized": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "resized"])

    par = media.sparkSession.sparkContext.defaultParallelism
    return media.select("media_id", "blob", "meta").repartition(par).mapInPandas(kernel, RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_hash string"


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 5) -> DataFrame:
    """Frame-sampling plumbing for video blobs: emits one row per sampled
    frame (fake frames = slices of the decoded pattern), md5-hashed. Output
    row count is deterministic, so the driver can rows-check it."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                px = deterministic_fake_decode(row["blob"], meta["width"], meta["height"])
                for i in range(max_frames):
                    frame = np.roll(px, i * every_n)
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "frame_hash": hashlib.md5(frame.tobytes()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_hash"])

    par = media.sparkSession.sparkContext.defaultParallelism
    return media.select("media_id", "blob", "meta").repartition(par).mapInPandas(kernel, FRAME_SCHEMA)
