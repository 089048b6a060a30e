"""WAV codec + audio features (valentinus_spark/audio.py) and the real
audio paths through the multimodal operators."""

import struct

import numpy as np
import pytest

from valentinus_spark.audio import audio_features, decode_wav, encode_wav, is_wav


def _sine(freq=440.0, rate=8000, secs=0.5):
    t = np.arange(int(rate * secs)) / rate
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_wav_roundtrip_16bit():
    x = _sine()
    data = encode_wav(x, 8000)
    assert is_wav(data)
    back, rate = decode_wav(data)
    assert rate == 8000
    assert back.shape == x.shape
    assert np.max(np.abs(back - x)) < 2.0 / 32768  # 16-bit quantization


def test_wav_stereo_downmix_and_float32():
    rate = 4000
    left = np.full(100, 0.5, dtype="<f4")
    right = np.full(100, -0.1, dtype="<f4")
    inter = np.empty(200, dtype="<f4")
    inter[0::2], inter[1::2] = left, right
    raw = inter.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 2, rate, rate * 8, 8, 32)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    data = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    samples, r = decode_wav(data)
    assert r == rate and samples.size == 100
    assert np.allclose(samples, 0.2, atol=1e-6)  # (0.5 - 0.1) / 2


def test_wav_rejects_garbage_and_compressed():
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    data = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(NotImplementedError):
        decode_wav(data)


def test_audio_features_deterministic_and_discriminative():
    lo, hi = _sine(200.0), _sine(1800.0)
    f_lo = audio_features(lo, 8000, 16)
    f_hi = audio_features(hi, 8000, 16)
    assert f_lo.shape == (16,)
    assert np.array_equal(f_lo, audio_features(lo, 8000, 16))
    # spectral centroid (slot 2 of each window) must rank hi > lo
    assert f_hi[2] > f_lo[2]
    # silence has zero energy
    assert audio_features(np.zeros(1000, dtype=np.float32), 8000, 8)[0] == 0.0


def test_spark_real_wav_features(spark):
    from valentinus_spark.multimodal import MEDIA_SCHEMA, extract_media_features

    wav = encode_wav(_sine(), 8000)
    media = spark.createDataFrame(
        [("a1", "audio", wav, None)], MEDIA_SCHEMA
    )
    row = extract_media_features(media, dim=16, decode_stub=False).first()
    samples, rate = decode_wav(wav)
    assert np.allclose(row["features"], audio_features(samples, rate, 16), atol=1e-6)


def test_spark_real_wav_chunking(spark):
    from valentinus_spark.multimodal import MEDIA_SCHEMA, chunk_audio

    wav = encode_wav(_sine(secs=1.0), 8000)  # 1s of audio
    media = spark.createDataFrame([("a2", "audio", wav, None)], MEDIA_SCHEMA)
    rows = chunk_audio(
        media, window_ms=250, hop_ms=250, decode_stub=False
    ).collect()
    assert len(rows) == 4
    assert [r["start_ms"] for r in rows] == [0, 250, 500, 750]
    # overlapping hop doubles (minus one) the window count
    rows2 = chunk_audio(media, window_ms=250, hop_ms=125, decode_stub=False).collect()
    assert len(rows2) == 7
