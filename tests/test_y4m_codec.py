"""y4m parser verification (functions/y4m.py) + the real video
frame-sampling path.

Independence: the C420 and header-variant decodes run against
HAND-CRAFTED byte literals written from the YUV4MPEG2 specification, not
against our own encoder — so header-math bugs cannot self-cancel; the
encoder is then checked against the same literals.
"""

from __future__ import annotations

import numpy as np
import pytest

from flowbyte_spark.functions import y4m


def test_decode_handcrafted_mono():
    payload = (
        b"YUV4MPEG2 W4 H2 F30:1 Ip A1:1 Cmono\n"
        b"FRAME\n" + bytes(range(8)) +
        b"FRAME\n" + bytes(range(100, 108))
    )
    frames, fps = y4m.decode_y4m(payload)
    assert fps == (30, 1)
    assert frames.shape == (2, 2, 4)
    assert frames[0].reshape(-1).tolist() == list(range(8))
    assert frames[1].reshape(-1).tolist() == list(range(100, 108))


def test_decode_handcrafted_c420_skips_chroma():
    # 4x2 C420: Y = 8 bytes, Cb = Cr = 2 bytes each per frame
    ybytes = bytes(range(8))
    payload = (
        b"YUV4MPEG2 W4 H2 F25:1 C420jpeg\n"
        b"FRAME\n" + ybytes + b"\xAA\xBB" + b"\xCC\xDD"
    )
    frames, fps = y4m.decode_y4m(payload)
    assert frames.shape == (1, 2, 4)
    assert frames[0].reshape(-1).tolist() == list(range(8))


def test_encoder_matches_spec_literal():
    frames = np.arange(8, dtype=np.uint8).reshape(1, 2, 4)
    payload = y4m.encode_y4m(frames, fps=(30, 1))
    assert payload == (
        b"YUV4MPEG2 W4 H2 F30:1 Ip A1:1 Cmono\nFRAME\n" + bytes(range(8))
    )
    back, fps = y4m.decode_y4m(payload)
    assert fps == (30, 1) and np.array_equal(back, frames)


def test_fail_loud():
    with pytest.raises(ValueError, match="magic"):
        y4m.decode_y4m(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="interlaced"):
        y4m.decode_y4m(b"YUV4MPEG2 W4 H2 F25:1 It Cmono\nFRAME\n" + bytes(8))
    with pytest.raises(ValueError, match="unsupported"):
        y4m.decode_y4m(b"YUV4MPEG2 W4 H2 C411\nFRAME\n" + bytes(8))
    with pytest.raises(ValueError, match="truncated"):
        y4m.decode_y4m(b"YUV4MPEG2 W4 H2 Cmono\nFRAME\n" + bytes(5))
    with pytest.raises(ValueError, match="even"):
        y4m.decode_y4m(b"YUV4MPEG2 W3 H2 C420\nFRAME\n" + bytes(6))


def _video_df(spark, n_frames=10, fps=(10, 1)):
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(n_frames, 4, 6), dtype=np.uint8)
    payload = y4m.encode_y4m(frames, fps=fps)
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload))],
        "media_id long, kind string, payload binary",
    ).selectExpr(
        "media_id",
        "kind",
        "payload",
        "named_struct('mime', 'video/x-yuv4mpeg', 'width', CAST(6 AS BIGINT), "
        "'height', CAST(4 AS BIGINT), 'duration_ms', CAST(1000 AS BIGINT)) AS meta",
    )
    return frames, df


def test_extract_features_real_y4m(spark):
    from flowbyte_spark.operators.multimodal import (
        _y4m_features,
        extract_features,
    )

    frames, df = _video_df(spark)
    out = extract_features(
        df.select("media_id", "kind", "payload"), fake_decode=False
    ).collect()
    assert len(out) == 1
    assert out[0].features == _y4m_features(frames, (10, 1))
    assert out[0].features[:4] == [6.0, 4.0, 10.0, 1000.0]


def test_sample_frames_real_y4m(spark):
    from flowbyte_spark.functions.png import decode_png
    from flowbyte_spark.operators.multimodal import sample_frames

    frames, df = _video_df(spark, n_frames=10, fps=(10, 1))  # 1 s of video
    rows = sample_frames(df, every_ms=300, max_frames=16).collect()
    # frames at 0/300/600/900 ms -> indices 0, 3, 6, 9
    assert [(r.frame_idx, r.ts_ms) for r in rows] == [
        (0, 0), (3, 300), (6, 600), (9, 900)
    ]
    for r in rows:
        img = decode_png(bytes(r.payload))
        assert np.array_equal(img[:, :, 0], frames[r.frame_idx])


def test_sample_frames_non_y4m_still_fails_loud(spark):
    from flowbyte_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x00\x00\x18ftypmp42-not-real"))],
        "media_id long, kind string, payload binary",
    ).selectExpr(
        "media_id", "kind", "payload",
        "named_struct('mime', 'video/mp4', 'width', CAST(NULL AS BIGINT), "
        "'height', CAST(NULL AS BIGINT), 'duration_ms', CAST(2000 AS BIGINT)) AS meta",
    )
    with pytest.raises(Exception, match="NotImplementedError|codec library"):
        sample_frames(df, fake_decode=False).collect()
    rows = sample_frames(df, every_ms=1000, fake_decode=True).collect()
    assert len(rows) == 2  # duration 2000 // 1000


def test_zero_or_negative_fps_fails_loud():
    # 'F8:0' used to decode fine and then ZeroDivisionError inside frame
    # sampling on the executor (r8 ADVICE); reject at parse time instead.
    with pytest.raises(ValueError, match="positive"):
        y4m.decode_y4m(b"YUV4MPEG2 W4 H2 F8:0 Cmono\nFRAME\n" + bytes(8))
    with pytest.raises(ValueError, match="positive"):
        y4m.decode_y4m(b"YUV4MPEG2 W4 H2 F0:1 Cmono\nFRAME\n" + bytes(8))
