"""Minimal WAV (RIFF/PCM) codec — stdlib ``struct`` + numpy only.

Makes the multimodal tier's AUDIO path real in an environment with no
torchaudio/soundfile: uncompressed PCM (format tag 1), 8-bit unsigned or
16-bit signed, any channel count — the shape every stock WAV writer
emits.  Compressed/float formats (mu-law, IEEE float, extensible) raise
``ValueError`` naming the tag — fail-loud, never a silently wrong
waveform.  PCM is lossless, so ``decode_wav(encode_wav(x)) == x``
bit-exactly — which is what lets the decode path sit under the driver's
hash gate (v98): DuckDB recomputes the expected sample statistics
directly from the md5 bytes the fixture corpus is built from.

Scale note: decode is per-payload Python inside Arrow-batched
``mapInPandas`` stages (operators/multimodal.py); nothing touches the
driver.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 array of shape (n,) or (n, channels) -> RIFF/PCM bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("encode_wav expects (n[, channels]) samples")
    n, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM bytes -> (samples int16 array of shape (n, channels),
    sample_rate).  8-bit input is widened to int16 by centering
    (``(v - 128) << 8``) so callers see ONE sample dtype."""
    if not is_wav(payload):
        raise ValueError("not a WAV: RIFF/WAVE header missing")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _block_align, bits = fmt
    if tag != 1:
        raise ValueError(f"non-PCM WAV (format tag {tag}) unsupported")
    if channels < 1:
        raise ValueError("WAV declares zero channels")
    if bits == 16:
        frame = 2 * channels
    elif bits == 8:
        frame = channels
    else:
        raise ValueError(f"{bits}-bit PCM unsupported (8/16 only)")
    if len(data) % frame:
        raise ValueError(
            f"WAV data chunk length {len(data)} is not a multiple of the "
            f"{frame}-byte frame ({channels} ch x {bits}-bit) — truncated "
            "or corrupt payload"
        )
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    else:
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
    return arr.reshape(-1, channels).astype(np.int16), rate
