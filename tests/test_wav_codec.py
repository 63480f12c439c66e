"""WAV codec verification (functions/wav.py).

Independence: the stdlib ``wave`` module is a second, unrelated RIFF
implementation — our encoder's bytes must parse under it frame-exactly
and vice versa, so a header-math bug in our codec cannot self-cancel.
"""

from __future__ import annotations

import io
import wave as stdlib_wave

import numpy as np
import pytest

from flowbyte_spark.functions import wav


def test_roundtrip_bit_exact():
    rng = np.random.default_rng(1)
    for shape in [(100,), (100, 1), (257, 2), (3, 4)]:
        s = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
        back, rate = wav.decode_wav(wav.encode_wav(s, 44100))
        want = s[:, None] if s.ndim == 1 else s
        assert rate == 44100
        assert np.array_equal(back, want)


def test_cross_validated_against_stdlib_wave():
    rng = np.random.default_rng(2)
    s = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    # ours -> stdlib
    payload = wav.encode_wav(s, 22050)
    with stdlib_wave.open(io.BytesIO(payload)) as w:
        assert (w.getnchannels(), w.getframerate(), w.getsampwidth()) == (2, 22050, 2)
        frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(frames.reshape(-1, 2), s)
    # stdlib -> ours
    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(s.astype("<i2").tobytes())
    back, rate = wav.decode_wav(buf.getvalue())
    assert rate == 22050 and np.array_equal(back, s)


def test_8bit_widens_centered():
    buf = io.BytesIO()
    raw = bytes([0, 128, 255, 64])
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(raw)
    back, _ = wav.decode_wav(buf.getvalue())
    assert back[:, 0].tolist() == [(-128) << 8, 0, 127 << 8, (-64) << 8]


def test_fail_loud_on_unsupported():
    s = np.zeros(10, dtype=np.int16)
    good = wav.encode_wav(s)
    with pytest.raises(ValueError, match="RIFF"):
        wav.decode_wav(b"\x89PNG1234WAVE")
    # flip format tag to 3 (IEEE float)
    fmt_at = good.index(b"fmt ") + 8
    bad = good[:fmt_at] + b"\x03\x00" + good[fmt_at + 2 :]
    with pytest.raises(ValueError, match="format tag 3"):
        wav.decode_wav(bad)
    with pytest.raises(ValueError, match="truncated|missing"):
        wav.decode_wav(good[:-6])


def test_extract_features_real_wav(spark):
    from flowbyte_spark.operators.multimodal import (
        _wav_features,
        extract_features,
    )

    rows = []
    local = {}
    for i in range(4):
        rng = np.random.default_rng(i)
        s = rng.integers(-32768, 32768, size=(64, 1 + i % 2), dtype=np.int16)
        payload = wav.encode_wav(s, 16000)
        rows.append((i, "audio", bytearray(payload)))
        local[i] = _wav_features(s, 16000)
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {
        r.media_id: r.features
        for r in extract_features(df, fake_decode=False).collect()
    }
    assert out == local
    assert out[0][:3] == [1.0, 16000.0, 64.0]


def test_strict_mode_fails_loud_on_corrupt_wav(spark):
    from flowbyte_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(1, "audio", bytearray(b"RIFF\x10\x00\x00\x00WAVEgarb"))],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception, match="ValueError|missing|truncated"):
        extract_features(df, fake_decode=False).collect()
    rows = extract_features(df, fake_decode=True).collect()
    assert len(rows) == 1


def test_partial_trailing_frame_fails_loud():
    # A data chunk whose length is not a multiple of the frame size is
    # corrupt; decoding must raise, not silently drop the tail (r8 ADVICE).
    s = np.arange(20, dtype=np.int16).reshape(10, 2)
    good = wav.encode_wav(s, 8000)
    data_off = good.index(b"data") + 8
    # lop one byte off the data chunk and patch both RIFF and data sizes
    bad = bytearray(good[:-1])
    import struct

    riff_len, = struct.unpack("<I", bad[4:8])
    struct.pack_into("<I", bad, 4, riff_len - 1)
    data_len, = struct.unpack_from("<I", bad, data_off - 4)
    struct.pack_into("<I", bad, data_off - 4, data_len - 1)
    with pytest.raises(ValueError, match="not a multiple"):
        wav.decode_wav(bytes(bad))
