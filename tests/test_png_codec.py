"""PNG codec (functions/png.py) + the real image-kernel path through the
multimodal operators.

The decoder is checked against an INDEPENDENT reference encoder
implemented here (straight from the RFC 2083 filter definitions), so an
encode/decode bug that is self-consistent still fails.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from flowbyte_spark.functions.png import (
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
)


def _reference_png(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Independent encoder: filters each scanline per the spec, cycling
    through ``ftypes``."""
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride = w * c
    flat = arr.reshape(h, stride).astype(int)
    prev = np.zeros(stride, dtype=int)
    raws = []
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur, line = flat[y], np.zeros(stride, dtype=int)
        for i in range(stride):
            left = cur[i - c] if i >= c else 0
            ul = prev[i - c] if i >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = prev[i]
            elif ft == 3:
                pred = (left + prev[i]) >> 1
            else:
                p = left + prev[i] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[i]), abs(p - ul)
                pred = (
                    left if pa <= pb and pa <= pc else (prev[i] if pb <= pc else ul)
                )
            line[i] = (cur[i] - pred) & 0xFF
        raws.append(bytes([ft]) + bytes(line.astype(np.uint8)))
        prev = cur
    raw = b"".join(raws)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize(
    "shape", [(1, 1), (4, 4), (7, 5), (16, 16, 3), (9, 3, 4), (5, 8, 2)]
)
def test_roundtrip(shape):
    a = np.random.RandomState(7).randint(0, 256, size=shape).astype(np.uint8)
    back = decode_png(encode_png(a))
    exp = a[:, :, None] if a.ndim == 2 else a
    assert np.array_equal(back, exp)


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_decode_every_filter_type(ftypes, channels):
    a = (
        np.random.RandomState(11)
        .randint(0, 256, size=(10, 6, channels))
        .astype(np.uint8)
    )
    assert np.array_equal(decode_png(_reference_png(a, ftypes)), a)


def test_malformed_inputs_fail_loud():
    assert not is_png(b"not a png")
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png")
    a = np.zeros((4, 4), dtype=np.uint8)
    png = encode_png(a)
    with pytest.raises(ValueError):
        decode_png(png[:30])  # truncated chunk
    with pytest.raises(ValueError, match="channel count"):
        encode_png(np.zeros((2, 2, 5), dtype=np.uint8))


def test_resize_nearest_semantics():
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = resize_nearest(a, 8, 8)
    assert up.shape == (8, 8)
    assert np.array_equal(up[::2, ::2], a)  # each source pixel survives
    down = resize_nearest(a, 2, 2)
    assert np.array_equal(down, a[::2, ::2])


# ---------------------------------------------------------------------------
# real kernel through the Spark operators (fake_decode=False)
# ---------------------------------------------------------------------------


def _png_media(spark, n=6):
    import hashlib

    rows = []
    for i in range(n):
        px = np.frombuffer(
            hashlib.md5(f"img{i}".encode()).digest(), dtype=np.uint8
        ).reshape(4, 4)
        rows.append((i, "image", bytearray(encode_png(px))))
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def test_extract_features_real_png(spark):
    import hashlib

    from flowbyte_spark.operators.multimodal import extract_features

    out = {
        r.media_id: r.features
        for r in extract_features(
            _png_media(spark), fake_decode=False
        ).collect()
    }
    for i in range(6):
        px = np.frombuffer(
            hashlib.md5(f"img{i}".encode()).digest(), dtype=np.uint8
        )
        f = out[i]
        assert f[:4] == [4.0, 4.0, 1.0, 16.0]
        assert f[4] == float(px.sum())
        assert f[5] == float(px.min()) and f[6] == float(px.max())
        hist = np.bincount(px >> 5, minlength=8)
        assert f[7:15] == [float(x) for x in hist]


def test_extract_features_non_png_still_fails_loud(spark):
    from flowbyte_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(1, "image", bytearray(b"JFIFnotreallyjpeg"))],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|media library"):
        extract_features(df, fake_decode=False).collect()


def test_resize_media_real_png_pixels(spark):
    import hashlib

    from flowbyte_spark.operators.multimodal import resize_media

    media = _png_media(spark).selectExpr(
        "media_id",
        "kind",
        "payload",
        "named_struct('mime', 'image/png', 'width', CAST(4 AS BIGINT), "
        "'height', CAST(4 AS BIGINT), 'duration_ms', CAST(NULL AS BIGINT)) AS meta",
    )
    rows = resize_media(media, 8, 8, fake_decode=False).collect()
    assert len(rows) == 6
    out = {}
    for r in rows:
        assert r.meta.width == 8 and r.meta.height == 8
        assert r.meta.mime == "image/png"
        out[r.media_id] = decode_png(bytes(r.payload))
    for i in range(6):
        px = np.frombuffer(
            hashlib.md5(f"img{i}".encode()).digest(), dtype=np.uint8
        ).reshape(4, 4, 1)
        assert out[i].shape == (8, 8, 1)
        # nearest-neighbor upscale: the even grid IS the original image
        assert np.array_equal(out[i][::2, ::2], px)


def test_fake_mode_survives_corrupt_png_signature(spark):
    """Round-6 review finding: fake_decode=True must never raise — a
    payload carrying the PNG signature but corrupt bytes falls back to
    the deterministic stub instead of crashing the task."""
    from flowbyte_spark.operators.multimodal import extract_features, resize_media

    corrupt = b"\x89PNG\r\n\x1a\n" + b"garbage-not-chunks"
    df = spark.createDataFrame(
        [(1, "image", bytearray(corrupt))],
        "media_id long, kind string, payload binary",
    )
    rows = extract_features(df, fake_decode=True).collect()
    assert len(rows) == 1 and len(rows[0].features) == 16
    media = df.selectExpr(
        "media_id", "kind", "payload",
        "named_struct('mime', 'image/png', 'width', CAST(NULL AS BIGINT), "
        "'height', CAST(NULL AS BIGINT), 'duration_ms', CAST(NULL AS BIGINT)) AS meta",
    )
    out = resize_media(media, 4, 4, fake_decode=True).collect()
    assert len(out) == 1 and out[0].payload is not None
    # strict mode still fails loud on the same payload
    import pytest as _pytest

    with _pytest.raises(Exception, match="ValueError|truncated|signature|zlib|PNG"):
        extract_features(df, fake_decode=False).collect()
