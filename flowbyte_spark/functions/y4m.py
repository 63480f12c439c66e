"""Minimal YUV4MPEG2 (y4m) parser/emitter — stdlib + numpy only.

Makes the multimodal tier's VIDEO path real in an environment with no
ffmpeg: y4m is the uncompressed interchange format every video toolchain
can emit (``ffmpeg -f yuv4mpeg2``), a text header plus raw planar
frames — no entropy coding, so parsing is exact and the decode path can
sit under the driver's hash gate (v99).  Supported colorspaces: C420*
(all chroma-siting variants share the plane layout), C444 and Cmono.
Interlaced content and unknown colorspaces raise ``ValueError``.

The decode returns LUMA frames: the engine's frame features and frame
sampling operate on Y (the standard basis for visual similarity /
shot-boundary work); chroma planes are parsed for layout correctness and
skipped.  Scale note: per-payload Python inside Arrow-batched
``mapInPandas`` stages (operators/multimodal.py).
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def is_y4m(payload: bytes | None) -> bool:
    return payload is not None and payload[: len(_MAGIC)] == _MAGIC


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """(n, H, W) uint8 luma frames -> monochrome y4m bytes."""
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("encode_y4m expects (n, H, W) uint8 frames")
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
    out = bytearray(head.encode())
    for i in range(n):
        out += b"FRAME\n"
        out += frames[i].tobytes()
    return bytes(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """y4m bytes -> ((n, H, W) uint8 luma frames, (fps_num, fps_den)).

    Chroma planes (C420*/C444) are validated for size and skipped;
    ``Cmono`` has none.  Raises ``ValueError`` on malformed headers,
    truncated frames, interlaced content or unsupported colorspaces.
    """
    if not is_y4m(payload):
        raise ValueError("not a y4m: YUV4MPEG2 magic missing")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("y4m header line unterminated")
    params = payload[len(_MAGIC) : nl].decode("ascii", "strict").split()
    width = height = None
    fps = (25, 1)
    colorspace = "C420"
    for p in params:
        if p.startswith("W"):
            width = int(p[1:])
        elif p.startswith("H"):
            height = int(p[1:])
        elif p.startswith("F"):
            num, den = (int(x) for x in p[1:].split(":"))
            if num <= 0 or den <= 0:
                raise ValueError(f"y4m frame rate {p!r} must be positive")
            fps = (num, den)
        elif p.startswith("I"):
            if p not in ("Ip",):  # progressive only
                raise ValueError(f"interlaced y4m ({p}) unsupported")
        elif p.startswith("C"):
            colorspace = p
    if not width or not height:
        raise ValueError("y4m header missing W/H")
    if colorspace.startswith("C420"):
        if width % 2 or height % 2:
            raise ValueError("C420 requires even dimensions")
        chroma = 2 * ((width // 2) * (height // 2))
    elif colorspace == "C444":
        chroma = 2 * width * height
    elif colorspace == "Cmono":
        chroma = 0
    else:
        raise ValueError(f"y4m colorspace {colorspace} unsupported")
    ysize = width * height

    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m FRAME marker missing or unterminated")
        pos = fnl + 1
        end = pos + ysize + chroma
        if end > len(payload):
            raise ValueError("truncated y4m frame")
        frames.append(
            np.frombuffer(payload[pos : pos + ysize], dtype=np.uint8)
            .reshape(height, width)
            .copy()
        )
        pos = end
    return (
        np.stack(frames) if frames else np.zeros((0, height, width), np.uint8),
        fps,
    )
