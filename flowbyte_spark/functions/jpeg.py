"""Minimal baseline JPEG codec — stdlib ``struct`` + numpy only.

Widens the multimodal tier's REAL image path beyond PNG
(``functions/png.py``) in an environment with no Pillow/libjpeg:
baseline sequential DCT (SOF0), 8-bit, grayscale, 4:4:4 and 4:2:0
YCbCr (the web default), with restart intervals (DRI/RSTn) and the
quantization/Huffman tables of ISO/IEC 10918-1 Annex K (public
specification data).  Progressive (SOF2), arithmetic coding and other
sampling layouts raise ``ValueError`` — fail-loud, never a best-effort
image.

Verification strategy (tests/test_jpeg_codec.py): the bitstream layer
(markers, Huffman, zigzag, DC prediction, byte stuffing) round-trips
through ``decode_jpeg(encode_jpeg(x))`` and must equal a pure-numpy
reference that computes the same quantize→dequantize pipeline by the
spec's DIRECT cosine-sum formula, bypassing the bitstream entirely —
so neither layer can hide a bug in the other.

Scale note: decode is per-payload Python and runs INSIDE Arrow-batched
``mapInPandas`` stages (operators/multimodal.py) — nothing here touches
the driver; production deployments swap in a C-backed codec behind the
same bytes-in / array-out contract.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec constants (ISO/IEC 10918-1 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits-per-length counts, symbol values) — Annex K.3
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# orthonormal 8-point DCT-II basis: forward = C @ B @ C.T, inverse = C.T @ B @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(0.125) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def is_jpeg(payload: bytes | None) -> bool:
    return payload is not None and payload[:2] == b"\xff\xd8"


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled by the libjpeg-convention quality knob."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def s(t: np.ndarray) -> np.ndarray:
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int64)
    return s(_Q_LUMA), s(_Q_CHROMA)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    return np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane -> (n_blocks_y, n_blocks_x, 8, 8), edge-replicated."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    by, bx = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)[:h, :w]


def fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane -> zigzagged quantized coefficients
    (n_blocks, 64) int — the exact integers the bitstream carries."""
    blocks = _to_blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ux,...xy,vy->...uv", _C, blocks, _C)
    q = np.round(coef / qtab.reshape(8, 8).astype(np.float64))
    return q.reshape(-1, 64)[:, ZIGZAG].astype(np.int64)


def dequant_idct(zz: np.ndarray, qtab: np.ndarray, by: int, bx: int,
                 h: int, w: int) -> np.ndarray:
    """Inverse of :func:`fdct_quant`: (n_blocks, 64) zigzagged ints ->
    (h, w) float plane (still unclipped, centered on 128)."""
    coef = (zz[:, _UNZIGZAG] * qtab).reshape(by, bx, 8, 8).astype(np.float64)
    blocks = np.einsum("ux,...uv,vy->...xy", _C, coef, _C)
    return _from_blocks(blocks, h, w) + 128.0


# ---------------------------------------------------------------------------
# Huffman / bitstream
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def restart(self, m: int) -> None:
        """Pad to a byte boundary and emit RSTm (markers are not stuffed)."""
        if self.n:
            self.write(0x7F, 8 - self.n)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} in entropy data"
                    )
            self.acc = (self.acc << 8) | byte
            self.n += 8
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def expect_restart(self, m: int) -> None:
        """Discard pad bits and consume the RSTm marker at a restart
        boundary (restart markers sit on byte boundaries, unstuffed)."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (m & 7)
        ):
            raise ValueError(f"expected restart marker RST{m & 7}")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    # spec EXTEND: low range of a size-bit field encodes the negatives
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc: dict, ac: dict) -> int:
    diff = int(zz[0]) - pred
    size = _category(diff)
    code, length = dc[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac[(run << 4) | size]
        w.write(c, ln)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        c, ln = ac[0x00]  # EOB
        w.write(c, ln)
    return int(zz[0])


def _decode_block(r: _BitReader, pred: int, dc: dict, ac: dict) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    size = r.decode_symbol(dc)
    diff = _extend(r.read(size), size) if size else 0
    zz[0] = pred + diff
    k = 1
    while k < 64:
        sym = r.decode_symbol(ac)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("invalid AC run/size symbol")
            k += 16  # ZRL
            continue
        k += run
        if k >= 64:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(r.read(size), size)
        k += 1
    return zz, int(zz[0])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def subsample_box(plane: np.ndarray) -> np.ndarray:
    """2x2 box average (the canonical 4:2:0 downsample); even dims."""
    return (
        plane[0::2, 0::2] + plane[0::2, 1::2]
        + plane[1::2, 0::2] + plane[1::2, 1::2]
    ) / 4.0


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, -h % mult), (0, -w % mult)), mode="edge")


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 array of shape (H, W), (H, W, 1) or (H, W, 3) -> baseline
    JFIF bytes.

    ``subsampling``: ``"444"`` (no chroma subsampling — the decode
    differential is exact per plane) or ``"420"`` (2x2 box-averaged
    chroma, the web default).  ``restart_interval`` > 0 emits a DRI
    segment and an RSTn marker after every N MCUs (what camera/libjpeg
    output commonly carries for error resilience)."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    if pixels.ndim != 3 or pixels.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg expects (H, W[, 1|3]) pixels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w, nchan = pixels.shape
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError("image dimensions out of JPEG range")
    qy, qc = quant_tables(quality)
    sub420 = nchan == 3 and subsampling == "420"

    if nchan == 3:
        ycc = _rgb_to_ycbcr(pixels)
        if sub420:
            # pad the full-res planes to 16 so Y blocks and the 2x2
            # box-averaged chroma blocks share one exact MCU grid
            y = _pad_edge(ycc[..., 0], 16)
            planes = [
                y,
                subsample_box(_pad_edge(ycc[..., 1], 16)),
                subsample_box(_pad_edge(ycc[..., 2], 16)),
            ]
        else:
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qtabs = [qy, qc, qc]
        tsel = [0, 1, 1]  # huffman/quant table selector per component
        samp = [0x22, 0x11, 0x11] if sub420 else [0x11, 0x11, 0x11]
    else:
        planes = [pixels[..., 0].astype(np.float64)]
        qtabs = [qy]
        tsel = [0]
        samp = [0x11]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(qy[ZIGZAG].tolist())
    if nchan == 3:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x01]) + bytes(qc[ZIGZAG].tolist())
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, nchan)
    for i in range(nchan):
        sof += bytes([i + 1, samp[i], tsel[i]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if nchan == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tid, (bits, vals) in tables:
        body = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nchan])
    for i in range(nchan):
        dcac = 0x00 if tsel[i] == 0 else 0x11
        sos += bytes([i + 1, dcac])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    coefs = [fdct_quant(p, q) for p, q in zip(planes, qtabs)]
    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]
    wtr = _BitWriter()
    preds = [0] * nchan

    def put(ci: int, block_index: int) -> None:
        preds[ci] = _encode_block(
            wtr, coefs[ci][block_index], preds[ci],
            dc_codes[tsel[ci]], ac_codes[tsel[ci]],
        )

    if sub420:
        mcu_y, mcu_x = -(-h // 16), -(-w // 16)
        ybx = mcu_x * 2  # Y block-grid width (fdct_quant is row-major)
    else:
        mcu_y, mcu_x = -(-h // 8), -(-w // 8)

    rst = 0
    for i in range(mcu_y * mcu_x):
        r, c = divmod(i, mcu_x)
        if restart_interval and i and i % restart_interval == 0:
            wtr.restart(rst)
            rst = (rst + 1) & 7
            preds[:] = [0] * nchan
        if sub420:
            for dy in (0, 1):
                for dx in (0, 1):
                    put(0, (2 * r + dy) * ybx + (2 * c + dx))
            chroma_idx = r * mcu_x + c
            put(1, chroma_idx)
            put(2, chroma_idx)
        else:
            for ci in range(nchan):
                put(ci, i)
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 array of shape (H, W, channels).

    Supports SOF0, 8-bit, 1 or 3 components, 4:4:4 (all-1x1) and 4:2:0
    (luma 2x2 + chroma 1x1 — the web default) sampling, and restart
    intervals (DRI/RSTn).  Chroma upsampling is nearest-neighbor
    (pixel-replicate); a smooth-upsampling decoder like libjpeg's will
    differ by a few LSBs at chroma edges, which is within what any two
    conforming decoders may disagree by.  Raises ``ValueError`` on
    anything else — progressive, arithmetic, other samplings — naming
    the unsupported piece.
    """
    if not is_jpeg(payload):
        raise ValueError("not a JPEG: SOI marker missing")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # ITU-T T.81 B.1.1.2: a marker may be preceded by any number of
        # 0xFF fill bytes — skip them before reading the marker byte.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            o = 0
            while o < len(body):
                prec, tid = body[o] >> 4, body[o] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[o + 1 : o + 65], dtype=np.uint8)
                if zz.size != 64:
                    raise ValueError("short quant table")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = zz
                qtabs[tid] = tab
                o += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                codes = _canonical_codes(bits, vals)
                huff[(cls, tid)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                o += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            samps = [(ch, cv) for _, ch, cv, _ in comps]
            if not (
                all(sv == (1, 1) for sv in samps)
                or (len(samps) == 3 and samps == [(2, 2), (1, 1), (1, 1)])
            ):
                raise ValueError(
                    f"sampling factors {samps} unsupported "
                    "(4:4:4, grayscale and 4:2:0 only)"
                )
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise ValueError(f"non-baseline JPEG ({kind}) unsupported")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            nc = body[0]
            sel = {body[1 + 2 * i]: body[2 + 2 * i] for i in range(nc)}
            scan = (sel, pos)
            break
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    h, w, comps = frame
    sel, data_pos = scan
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    mcu_x, mcu_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    tables = []
    for cid, ch, cv, _qid in comps:
        dcac = sel.get(cid)
        if dcac is None:
            raise ValueError(f"component {cid} missing from SOS")
        dc = huff.get((0, dcac >> 4))
        ac = huff.get((1, dcac & 0x0F))
        if dc is None or ac is None:
            raise ValueError("SOS references undefined Huffman table")
        tables.append((dc, ac))

    rdr = _BitReader(payload[data_pos:])
    preds = [0] * len(comps)
    # per component: block grid (mcu_y * cv, mcu_x * ch)
    coefs = [
        np.zeros((mcu_y * cv * mcu_x * ch, 64), dtype=np.int64)
        for _, ch, cv, _ in comps
    ]
    rst = 0
    for i in range(mcu_y * mcu_x):
        if restart_interval and i and i % restart_interval == 0:
            rdr.expect_restart(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
        r, c = divmod(i, mcu_x)
        for ci, (_cid, ch, cv, _qid) in enumerate(comps):
            gw = mcu_x * ch  # component block-grid width
            for dy in range(cv):
                for dx in range(ch):
                    b = (r * cv + dy) * gw + (c * ch + dx)
                    coefs[ci][b], preds[ci] = _decode_block(
                        rdr, preds[ci], *tables[ci]
                    )

    planes = []
    for ci, (_cid, ch, cv, qid) in enumerate(comps):
        if qid not in qtabs:
            raise ValueError("frame references undefined quant table")
        gy, gx = mcu_y * cv, mcu_x * ch
        plane = dequant_idct(coefs[ci], qtabs[qid], gy, gx, gy * 8, gx * 8)
        if ch != hmax or cv != vmax:  # nearest-neighbor chroma upsample
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = planes[0][..., None]
    else:
        out = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
