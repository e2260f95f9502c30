"""Pure-Python WAV (RIFF PCM) codec + audio feature extraction.

Fills the audio leg of the multimodal surface (MEDIA_META declares
``media_type in (image|audio|video)``; images have real codecs since r2-r4,
audio had none). Implemented from the public RIFF/WAVE format description:
``RIFF`` container framing, ``fmt `` chunk (PCM, format tag 1), ``data``
chunk; 16-bit signed little-endian mono samples. PCM is lossless, so unlike
JPEG no quantization trick is needed — decode(encode(x)) == x always, and a
SQL oracle can recompute sample statistics from a deterministically derived
signal.

Decoder hardening mirrors the other codecs: parses chunk framing from the
bytes (nothing trusted from the metadata column), skips unknown chunks
(LIST/INFO etc.), validates the fmt tag, and raises ``ValueError`` on
malformed/truncated input.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 samples -> RIFF/WAVE bytes (PCM, 16-bit LE)."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects a 1-D int16 array")
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,                 # wFormatTag: PCM
        1,                 # nChannels: mono
        sample_rate,       # nSamplesPerSec
        sample_rate * 2,   # nAvgBytesPerSec
        2,                 # nBlockAlign
        16,                # wBitsPerSample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, mono int16 samples).

    Walks the chunk list, tolerating extra chunks before/after ``data``
    (real-world WAVs carry LIST/INFO/fact chunks); only PCM 16-bit mono is
    supported — anything else raises ``ValueError``."""
    try:
        return _decode_wav(blob)
    except (IndexError, struct.error) as exc:  # truncated/corrupt framing
        raise ValueError(f"malformed WAV: {exc}") from exc


def _decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        payload = blob[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError("WAV chunk truncated")
        if cid == b"fmt ":
            tag, nch, sr, _bps, _align, bits = struct.unpack("<HHIIHH", payload[:16])
            if tag != 1:
                raise ValueError(f"only PCM supported (wFormatTag={tag})")
            if nch != 1 or bits != 16:
                raise ValueError("only 16-bit mono supported")
            sample_rate = sr
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2").astype(np.int16)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sample_rate, samples


def audio_features(blob: bytes) -> dict:
    """Decode + integer-exact feature extraction for one WAV blob.

    All features are derived with integer arithmetic first and one shared
    float expression after (same bit-exactness discipline as the image
    kernels, so a SQL oracle reproduces them):

    - ``duration_ms`` = n * 1000 // sample_rate (integer floor)
    - ``rms``         = sqrt(sum(v^2) / n)
    - ``peak``        = max(|v|)
    - ``zero_crossings`` = #{i > 0 : sign(v_i) != sign(v_{i-1})}, with
      sign(0) treated as positive (matches SQL ``v >= 0``)
    """
    sr, v = decode_wav(blob)
    n = int(v.size)
    vi = v.astype(np.int64)
    nonneg = vi >= 0
    return {
        "sample_rate": sr,
        "n_samples": n,
        "duration_ms": n * 1000 // sr,
        "rms": float(np.sqrt(int((vi * vi).sum()) / n)) if n else 0.0,
        "peak": int(np.abs(vi).max()) if n else 0,
        "zero_crossings": int((nonneg[1:] != nonneg[:-1]).sum()) if n > 1 else 0,
    }
