"""Multimodal plumbing tests (multimodal.py): schema, determinism,
fan-out shape, and the stub gate."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from valentinus_spark.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", b"\x89PNG fake bytes 1", {"w": "64", "h": "64"}),
        ("m2", "image", b"\x89PNG fake bytes 2", {"w": "32", "h": "32"}),
        ("m3", "audio", b"RIFF fake wav", {"sr": "16000"}),
        ("m4", "video", b"\x00\x00ftyp fake mp4", None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_shape_and_determinism(media):
    out = extract_media_features(media, dim=32).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert all(len(r["features"]) == 32 for r in out)
    assert by_id["m1"]["n_bytes"] == len(b"\x89PNG fake bytes 1")
    # deterministic: same bytes → same features & sha
    again = {r["media_id"]: r for r in extract_media_features(media, dim=32).collect()}
    assert again["m1"]["features"] == by_id["m1"]["features"]
    assert again["m1"]["content_sha"] == by_id["m1"]["content_sha"]
    # distinct bytes → distinct features
    assert by_id["m1"]["features"] != by_id["m2"]["features"]


def test_video_frame_fanout(media):
    vids = media.filter(F.col("modality") == "video")
    frames = sample_video_frames(vids, every_n=10).collect()
    assert [r["frame_no"] for r in frames] == [0, 10, 20]
    assert all(len(r["features"]) == 32 for r in frames)


def test_stub_gate_raises(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_media_features(media, decode_stub=False).collect()


def test_resize_images_shape_and_meta(media):
    from valentinus_spark.multimodal import resize_images

    out = resize_images(media, width=8, height=8).collect()
    assert len(out) == media.count()
    for r in out:
        assert len(r["content"]) == 8 * 8 * 3
        assert r["meta"] == {"width": "8", "height": "8", "channels": "3"}


def test_resize_images_deterministic(media):
    from valentinus_spark.multimodal import resize_images

    a = {r["media_id"]: bytes(r["content"]) for r in resize_images(media, 4, 4).collect()}
    b = {r["media_id"]: bytes(r["content"]) for r in resize_images(media, 4, 4).collect()}
    assert a == b


def test_resize_images_stub_gate(media):
    import pytest
    from valentinus_spark.multimodal import resize_images

    with pytest.raises(Exception):
        resize_images(media, 4, 4, decode_stub=False).collect()


def test_chunk_audio_windows_and_overlap(media):
    from valentinus_spark.multimodal import chunk_audio

    out = chunk_audio(media, window_ms=1000, hop_ms=500).collect()
    assert out
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_id.items():
        starts = sorted(r["start_ms"] for r in rows)
        # hop of 500ms: consecutive windows advance by exactly the hop
        assert all(b - a == 500 for a, b in zip(starts, starts[1:]))
        assert all(len(r["features"]) == 32 for r in rows)


def test_chunk_audio_deterministic(media):
    from valentinus_spark.multimodal import chunk_audio

    a = {(r["media_id"], r["chunk_no"]): r["start_ms"] for r in chunk_audio(media).collect()}
    b = {(r["media_id"], r["chunk_no"]): r["start_ms"] for r in chunk_audio(media).collect()}
    assert a == b


def test_decode_error_null_mode_quarantines_bad_rows(spark):
    from valentinus_spark.imaging import encode_png
    from valentinus_spark.multimodal import MEDIA_SCHEMA, extract_media_features

    import numpy as np

    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    media = spark.createDataFrame(
        [
            ("ok", "image", good, None),
            ("bad", "image", b"\x89PNG\r\n\x1a\ntruncated", None),
            ("webp", "image", b"RIFF....WEBPVP8 unsupported", None),
        ],
        MEDIA_SCHEMA,
    )
    out = {
        r["media_id"]: r
        for r in extract_media_features(
            media, dim=8, decode_stub=False, on_error="null"
        ).collect()
    }
    assert out["ok"]["decode_error"] is None and out["ok"]["features"] is not None
    assert out["bad"]["features"] is None and "ValueError" in out["bad"]["decode_error"]
    assert out["webp"]["features"] is None
    assert "NotImplementedError" in out["webp"]["decode_error"]
    # raise mode still fails fast on the same input
    import pytest as _pt
    from pyspark.sql.utils import PythonException

    with _pt.raises(PythonException):
        extract_media_features(media, dim=8, decode_stub=False).collect()


def test_on_error_validation(spark):
    import pytest as _pt

    from valentinus_spark.multimodal import MEDIA_SCHEMA, extract_media_features

    media = spark.createDataFrame([("x", "image", b"", None)], MEDIA_SCHEMA)
    with _pt.raises(ValueError):
        extract_media_features(media, on_error="skip")


def test_resize_on_error_null_quarantines(spark):
    import numpy as np

    from valentinus_spark.imaging import encode_png
    from valentinus_spark.multimodal import MEDIA_SCHEMA, resize_images

    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    media = spark.createDataFrame(
        [("ok", "image", good, None), ("bad", "image", b"\x89PNG\r\n\x1a\nxx", None)],
        MEDIA_SCHEMA,
    )
    out = {
        r["media_id"]: r
        for r in resize_images(
            media, width=2, height=2, decode_stub=False, on_error="null"
        ).collect()
    }
    assert out["ok"]["content"] is not None and "decode_error" not in out["ok"]["meta"]
    assert out["bad"]["content"] is None
    assert "ValueError" in out["bad"]["meta"]["decode_error"]


def test_probe_media_header_all_containers():
    """Header probe agrees with the real encoders for every stdlib
    container, without decoding pixels/samples."""
    import numpy as np

    from valentinus_spark.audio import encode_wav
    from valentinus_spark.imaging import encode_bmp, encode_gif, encode_png
    from valentinus_spark.jpeg import encode_jpeg
    from valentinus_spark.multimodal import probe_media_header
    from valentinus_spark.video import encode_y4m

    img = np.arange(12 * 10 * 3, dtype=np.uint8).reshape(12, 10, 3) % 255
    assert probe_media_header(encode_png(img)) == {
        "container": "png", "width": 10, "height": 12, "depth": 8,
    }
    bmp = probe_media_header(encode_bmp(img))
    assert (bmp["container"], bmp["width"], bmp["height"]) == ("bmp", 10, 12)
    gif = probe_media_header(encode_gif(img[:, :, 0]))
    assert (gif["container"], gif["width"], gif["height"]) == ("gif", 10, 12)
    jp = probe_media_header(encode_jpeg(img))
    assert (jp["container"], jp["width"], jp["height"]) == ("jpeg", 10, 12)

    wav = encode_wav(np.zeros(100, dtype=np.int16), sample_rate=8000)
    assert probe_media_header(wav) == {
        "container": "wav", "width": 8000, "height": 1, "depth": 16,
    }
    frames = [np.zeros((8, 6), dtype=np.uint8) for _ in range(2)]
    y4m = probe_media_header(encode_y4m(frames))
    assert (y4m["container"], y4m["width"], y4m["height"]) == ("y4m", 6, 8)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        probe_media_header(b"not media at all")
    with _pytest.raises(ValueError):
        probe_media_header(b"\x89PNG\r\n\x1a\nXXXXIDAT")  # IHDR missing


def test_media_header_probe_spark_quarantine(spark):
    import numpy as np

    from valentinus_spark.imaging import encode_png
    from valentinus_spark.multimodal import media_header_probe

    img = np.zeros((4, 5, 3), dtype=np.uint8)
    rows = [
        ("ok", bytearray(encode_png(img))),
        ("bad", bytearray(b"garbage bytes here")),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    got = {r["media_id"]: r for r in media_header_probe(df).collect()}
    assert got["ok"]["container"] == "png" and got["ok"]["width"] == 5
    assert got["bad"]["container"] is None and got["bad"]["probe_error"]
