"""Y4M codec (valentinus_spark/video.py) and the real video frame path
through sample_video_frames."""

import numpy as np
import pytest

from valentinus_spark.video import decode_y4m, encode_y4m, is_y4m


def _frames(n=6, h=4, w=6, seed=21):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]


def test_y4m_roundtrip_luma():
    fs = _frames()
    data = encode_y4m(fs, fps=(30, 1))
    assert is_y4m(data)
    back, fps = decode_y4m(data)
    assert fps == (30, 1)
    assert len(back) == len(fs)
    for a, b in zip(back, fs):
        assert np.array_equal(a, b)


def test_y4m_rejects_garbage_and_odd_dims():
    with pytest.raises(ValueError):
        decode_y4m(b"MPEG nope")
    with pytest.raises(ValueError):
        encode_y4m([np.zeros((3, 5), dtype=np.uint8)])  # odd dims
    # truncated frame payload
    data = encode_y4m(_frames(n=2))
    with pytest.raises(ValueError):
        decode_y4m(data[:-5])


def test_y4m_odd_dim_c420_decode():
    # odd-dimension C420: writers size chroma ceil(w/2)*ceil(h/2)
    # (ADVICE r3 — flooring desynchronized the frame walk). Hand-build a
    # 3x5 two-frame stream the way ffmpeg/mjpegtools would.
    h, w = 3, 5
    f0 = np.arange(15, dtype=np.uint8).reshape(h, w)
    f1 = (f0 + 100).astype(np.uint8)
    chroma = b"\x80" * (((w + 1) // 2) * ((h + 1) // 2) * 2)  # 2*3*2=12
    data = (
        b"YUV4MPEG2 W5 H3 F25:1 C420\n"
        + b"FRAME\n" + f0.tobytes() + chroma
        + b"FRAME\n" + f1.tobytes() + chroma
    )
    frames, _ = decode_y4m(data)
    assert len(frames) == 2
    assert np.array_equal(frames[0], f0) and np.array_equal(frames[1], f1)


def test_y4m_c444_decode():
    # hand-build a C444 single-frame stream
    h, w = 2, 2
    y = np.arange(4, dtype=np.uint8).reshape(h, w)
    chroma = b"\x80" * (w * h * 2)
    data = (
        b"YUV4MPEG2 W2 H2 F25:1 C444\n" + b"FRAME\n" + y.tobytes() + chroma
    )
    frames, _ = decode_y4m(data)
    assert len(frames) == 1 and np.array_equal(frames[0], y)


def test_spark_real_y4m_frame_sampling(spark):
    from valentinus_spark.imaging import image_features
    from valentinus_spark.multimodal import MEDIA_SCHEMA, sample_video_frames

    fs = _frames(n=7)
    media = spark.createDataFrame(
        [("v1", "video", encode_y4m(fs), None)], MEDIA_SCHEMA
    )
    rows = sample_video_frames(media, every_n=3, decode_stub=False).collect()
    assert [r["frame_no"] for r in sorted(rows, key=lambda r: r["frame_no"])] == [0, 3, 6]
    want = image_features(fs[3][:, :, None], 32)
    got = next(r for r in rows if r["frame_no"] == 3)["features"]
    assert np.allclose(got, want, atol=1e-6)


def test_spark_non_y4m_video_still_raises(spark):
    from pyspark.sql.utils import PythonException

    from valentinus_spark.multimodal import MEDIA_SCHEMA, sample_video_frames

    media = spark.createDataFrame(
        [("v2", "video", b"\x00\x00\x01\xba mpeg-ps", None)], MEDIA_SCHEMA
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        sample_video_frames(media, decode_stub=False).collect()
