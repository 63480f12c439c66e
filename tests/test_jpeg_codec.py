"""Baseline JPEG codec verification (functions/jpeg.py).

The two layers check each other: the TRANSFORM layer (DCT, quantize,
color) is verified against the spec's direct cosine-sum formula computed
in slow pure numpy here, and the BITSTREAM layer (markers, Huffman,
zigzag, DC prediction, byte stuffing) is verified by the fact that
``decode_jpeg(encode_jpeg(x))`` reproduces that reference — the
reference never touches the bitstream, so a Huffman/zigzag/stuffing bug
cannot cancel out.
"""

from __future__ import annotations

import numpy as np
import pytest

from flowbyte_spark.functions import jpeg


# --- direct-formula reference (spec A.3.3), deliberately loop-based ------

def _ref_fdct(block: np.ndarray) -> np.ndarray:
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            out[u, v] = 0.25 * cu * cv * s
    return out


def _ref_idct(coef: np.ndarray) -> np.ndarray:
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += cu * cv * coef[u, v] \
                        * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            out[x, y] = 0.25 * s
    return out


def _ref_codec_gray(plane: np.ndarray, quality: int) -> np.ndarray:
    """What a correct baseline codec must output for a grayscale plane:
    per 8x8 block FDCT -> quantize -> dequantize -> IDCT, edge-padded."""
    qtab, _ = jpeg.quant_tables(quality)
    q = qtab.reshape(8, 8).astype(np.float64)
    h, w = plane.shape
    padded = np.pad(
        plane.astype(np.float64), ((0, -h % 8), (0, -w % 8)), mode="edge"
    )
    out = np.zeros_like(padded)
    for i in range(0, padded.shape[0], 8):
        for j in range(0, padded.shape[1], 8):
            coef = _ref_fdct(padded[i : i + 8, j : j + 8] - 128.0)
            deq = np.round(coef / q) * q
            out[i : i + 8, j : j + 8] = _ref_idct(deq) + 128.0
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)


def test_grayscale_matches_direct_formula_reference():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)  # ragged dims
    got = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75))
    ref = _ref_codec_gray(img, 75)
    assert got.shape == (24, 17, 1)
    diff = np.abs(got[..., 0].astype(int) - ref.astype(int))
    # matrix-DCT vs direct-sum float paths may round a borderline value
    # differently; anything beyond +/-1 on a handful of pixels is a bug
    assert diff.max() <= 1, diff.max()
    assert (diff == 0).mean() > 0.99, (diff == 0).mean()


def test_rgb_matches_per_plane_reference():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90)).astype(np.float64)
    # independent reference: spec color formulas written out longhand,
    # per-plane direct-formula codec (4:4:4 keeps planes independent)
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = jpeg.quant_tables(90)
    planes = []
    for plane, qtab in ((y, qy), (cb, qc), (cr, qc)):
        q = qtab.reshape(8, 8).astype(np.float64)
        out = np.zeros_like(plane)
        for i in range(0, 16, 8):
            for j in range(0, 16, 8):
                coef = _ref_fdct(plane[i : i + 8, j : j + 8] - 128.0)
                out[i : i + 8, j : j + 8] = _ref_idct(np.round(coef / q) * q) + 128.0
        planes.append(out)
    yr, cbr, crr = planes
    ref = np.stack([
        yr + 1.402 * (crr - 128.0),
        yr - 0.344136 * (cbr - 128.0) - 0.714136 * (crr - 128.0),
        yr + 1.772 * (cbr - 128.0),
    ], axis=-1)
    ref = np.clip(np.round(ref), 0, 255)
    assert np.abs(got - ref).max() <= 1


def test_roundtrip_quality_and_shapes():
    # smooth gradient: high quality must be near-lossless
    x = np.linspace(0, 255, 64, dtype=np.uint8)
    img = np.stack([np.tile(x, (40, 1))] * 3, axis=-1)
    back = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert back.shape == img.shape
    mse = np.mean((back.astype(float) - img.astype(float)) ** 2)
    psnr = 10 * np.log10(255**2 / max(mse, 1e-12))
    assert psnr >= 35, psnr
    # low quality still decodes to the right shape and rough content
    rough = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=5))
    assert rough.shape == img.shape
    assert abs(float(rough.mean()) - float(img.mean())) < 16


def test_bitstream_mechanics_are_exercised():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img, quality=95)
    assert jpeg.is_jpeg(payload) and payload.endswith(b"\xff\xd9")
    # noisy data at q95 produces 0xFF entropy bytes -> stuffing must appear
    sos = payload.index(b"\xff\xda")
    assert b"\xff\x00" in payload[sos:], "byte stuffing never exercised"
    jpeg.decode_jpeg(payload)  # and it decodes


def test_fail_loud_on_unsupported_variants():
    img = np.zeros((8, 8), dtype=np.uint8)
    good = jpeg.encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # flip SOF0 -> SOF2 (progressive)
    sof = good.index(b"\xff\xc0")
    prog = good[:sof] + b"\xff\xc2" + good[sof + 2 :]
    with pytest.raises(ValueError, match="progressive"):
        jpeg.decode_jpeg(prog)
    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated|marker"):
        jpeg.decode_jpeg(good[:-8])
    # unsupported sampling layout declared in SOF (4:1:1-ish)
    rgb = jpeg.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    sof = rgb.index(b"\xff\xc0")
    # comp 1 sampling byte sits at sof+2(marker)+2(len)+6(prec,h,w,nc)+1(cid)
    sub = bytearray(rgb)
    sub[sof + 11] = 0x41
    with pytest.raises(ValueError, match="sampling"):
        jpeg.decode_jpeg(bytes(sub))


def test_dc_prediction_spans_blocks():
    # constant image: every DC diff after the first must be 0 -> tiny file
    img = np.full((64, 64), 200, dtype=np.uint8)
    payload = jpeg.encode_jpeg(img, quality=50)
    back = jpeg.decode_jpeg(payload)
    assert int(back.min()) == int(back.max())
    assert abs(int(back[0, 0, 0]) - 200) <= 2
    assert len(payload) < 900  # 64 blocks of pure EOB + headers


# --- Spark-side dispatch (Arrow-batched mapInPandas plumbing) -------------

def _jpeg_media(spark):
    rows = []
    for i in range(5):
        rng = np.random.default_rng(i)
        arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        rows.append((i, "image", bytearray(jpeg.encode_jpeg(arr, quality=90))))
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def test_extract_features_real_jpeg(spark):
    from flowbyte_spark.operators.multimodal import (
        _png_features,
        extract_features,
    )

    media = _jpeg_media(spark)
    out = {
        r.media_id: r.features
        for r in extract_features(media, fake_decode=False).collect()
    }
    # the executor-side kernel must equal a local decode of the same
    # payload (codec correctness is proven against the direct-formula
    # reference above; this checks the Spark dispatch + batch plumbing)
    for mid, _kind, payload in media.collect():
        assert out[mid] == _png_features(jpeg.decode_jpeg(bytes(payload)))
        assert out[mid][:3] == [8.0, 8.0, 3.0]


def test_resize_media_real_jpeg(spark):
    from flowbyte_spark.operators.multimodal import resize_media

    media = _jpeg_media(spark).selectExpr(
        "media_id",
        "kind",
        "payload",
        "named_struct('mime', 'image/jpeg', 'width', CAST(8 AS BIGINT), "
        "'height', CAST(8 AS BIGINT), 'duration_ms', CAST(NULL AS BIGINT)) AS meta",
    )
    rows = resize_media(media, 4, 4, fake_decode=False).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.meta.width == 4 and r.meta.height == 4
        back = jpeg.decode_jpeg(bytes(r.payload))
        assert back.shape == (4, 4, 3)


def test_strict_mode_still_fails_loud_on_corrupt_jpeg(spark):
    import pytest as _pytest

    from flowbyte_spark.operators.multimodal import extract_features

    corrupt = b"\xff\xd8" + b"garbage-not-segments"
    df = spark.createDataFrame(
        [(1, "image", bytearray(corrupt))],
        "media_id long, kind string, payload binary",
    )
    with _pytest.raises(Exception, match="ValueError|marker|truncated"):
        extract_features(df, fake_decode=False).collect()
    # fake mode keeps its never-raises contract
    rows = extract_features(df, fake_decode=True).collect()
    assert len(rows) == 1 and len(rows[0].features) > 0


# --- 4:2:0 subsampling + restart intervals (round-8 widening) -------------

def _ref_codec_plane(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Direct-formula FDCT->quant->dequant->IDCT over an 8-multiple plane."""
    q = qtab.reshape(8, 8).astype(np.float64)
    out = np.zeros_like(plane)
    for i in range(0, plane.shape[0], 8):
        for j in range(0, plane.shape[1], 8):
            coef = _ref_fdct(plane[i : i + 8, j : j + 8] - 128.0)
            out[i : i + 8, j : j + 8] = _ref_idct(np.round(coef / q) * q) + 128.0
    return out


def test_420_matches_direct_formula_reference():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(20, 26, 3), dtype=np.uint8)  # pads to 32x32
    got = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=85, subsampling="420")
    ).astype(np.float64)
    # reference: spec color formulas + per-plane direct-formula codec with
    # 2x2 box-averaged chroma and nearest-neighbor (replicate) upsampling
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = jpeg.quant_tables(85)

    def pad16(p):
        return np.pad(p, ((0, -p.shape[0] % 16), (0, -p.shape[1] % 16)),
                      mode="edge")

    def box(p):
        return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4

    yr = _ref_codec_plane(pad16(y), qy)
    cbr = np.repeat(np.repeat(_ref_codec_plane(box(pad16(cb)), qc), 2, 0), 2, 1)
    crr = np.repeat(np.repeat(_ref_codec_plane(box(pad16(cr)), qc), 2, 0), 2, 1)
    h, w = img.shape[:2]
    ref = np.stack([
        yr + 1.402 * (crr - 128.0),
        yr - 0.344136 * (cbr - 128.0) - 0.714136 * (crr - 128.0),
        yr + 1.772 * (cbr - 128.0),
    ], axis=-1)[:h, :w]
    ref = np.clip(np.round(ref), 0, 255)
    assert np.abs(got - ref).max() <= 1


def test_restart_intervals_roundtrip_and_matter():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(40, 72, 3), dtype=np.uint8)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    with_rst = jpeg.encode_jpeg(img, quality=90, restart_interval=3)
    assert b"\xff\xdd" in with_rst  # DRI present
    assert any(bytes([0xFF, 0xD0 + m]) in with_rst for m in range(8))
    assert np.array_equal(jpeg.decode_jpeg(with_rst), plain)
    # 4:2:0 + restarts compose
    w420 = jpeg.encode_jpeg(img, quality=90, subsampling="420",
                            restart_interval=2)
    p420 = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90,
                                             subsampling="420"))
    assert np.array_equal(jpeg.decode_jpeg(w420), p420)
    # corrupting a restart marker fails loud, not silently wrong
    broken = bytearray(with_rst)
    i = broken.index(bytes([0xFF, 0xD0]))
    broken[i + 1] = 0xD7  # wrong sequence number
    with pytest.raises(ValueError, match="restart"):
        jpeg.decode_jpeg(bytes(broken))


def test_420_roundtrip_quality():
    x = np.linspace(0, 255, 64, dtype=np.uint8)
    img = np.stack([np.tile(x, (48, 1))] * 3, axis=-1)
    back = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95, subsampling="420"))
    assert back.shape == img.shape
    mse = np.mean((back.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) >= 32


def test_fill_bytes_before_marker_are_skipped():
    # ITU-T T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    # marker; other conforming encoders emit them (r8 ADVICE).  Insert
    # fill bytes before a header-loop marker and require identical decode.
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = jpeg.encode_jpeg(img)
    want = jpeg.decode_jpeg(good)
    dqt = good.index(b"\xff\xdb")
    padded = good[:dqt] + b"\xff\xff\xff" + good[dqt:]
    assert np.array_equal(jpeg.decode_jpeg(padded), want)
    # and before the SOS marker too
    sos = good.index(b"\xff\xda")
    padded = good[:sos] + b"\xff" + good[sos:]
    assert np.array_equal(jpeg.decode_jpeg(padded), want)
