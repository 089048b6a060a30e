"""Baseline JPEG codec (valentinus_spark/jpeg.py) and its path through
the multimodal operators."""

import numpy as np
import pytest

from valentinus_spark.jpeg import decode_jpeg, encode_jpeg, is_jpeg


def _gradient(h=24, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / (w - 1),
            yy * 255 / (h - 1),
            (xx + yy) * 255 / (w + h - 2),
        ],
        axis=2,
    ).astype(np.uint8)


def test_jpeg_roundtrip_444_quantization_bounded():
    img = _gradient()
    data = encode_jpeg(img)
    assert is_jpeg(data)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4 and err.max() < 25  # quantization-level only


def test_jpeg_roundtrip_420_subsampled():
    img = _gradient()
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() < 40


def test_jpeg_non_mcu_aligned_dims():
    # 13x17 forces edge padding on both axes (and 4:2:0 MCU padding)
    img = _gradient(13, 17)
    for ss in (False, True):
        out = decode_jpeg(encode_jpeg(img, subsample=ss))
        assert out.shape == (13, 17, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 8


def test_jpeg_grayscale_and_flat():
    g = np.full((16, 16), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - 77).max() <= 3


def test_jpeg_restart_markers():
    img = _gradient()
    for ri in (1, 3):
        out = decode_jpeg(encode_jpeg(img, restart_interval=ri))
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 4


def test_jpeg_rejects_garbage_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not jpeg")
    # splice a progressive SOF2 in place of SOF0
    data = bytearray(encode_jpeg(_gradient(8, 8)))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_jpeg_byte_stuffing_survives():
    # high-frequency noise maximizes 0xFF-byte likelihood in the stream;
    # decode must still parse (values differ by quantization, shape holds)
    rng = np.random.default_rng(44)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (16, 16, 3)


def test_jpeg_fill_bytes_before_markers():
    # T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker
    # code; crawl JPEGs use them as padding. Decode of a padded stream
    # must equal decode of the original (ADVICE r3).
    img = _gradient(16, 16)
    data = encode_jpeg(img)
    base = decode_jpeg(data)
    padded = bytearray()
    padded += data[:2]  # SOI
    pos = 2
    # inject fill bytes before every marker in the header region (up to
    # SOS, whose entropy-coded payload must not be touched)
    while pos + 4 <= len(data):
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        padded += b"\xff\xff\xff"  # fill bytes, then the real 0xFF+code
        if marker == 0xDA:  # SOS: copy the rest verbatim
            padded += data[pos:]
            break
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        padded += data[pos : pos + 2 + seglen]
        pos += 2 + seglen
    out = decode_jpeg(bytes(padded))
    assert np.array_equal(out, base)


def test_spark_real_jpeg_features_and_resize(spark):
    from valentinus_spark.imaging import decode_png, image_features
    from valentinus_spark.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        resize_images,
    )

    img = _gradient(16, 16)
    jpg = encode_jpeg(img)
    media = spark.createDataFrame([("j1", "image", jpg, None)], MEDIA_SCHEMA)
    row = extract_media_features(media, dim=16, decode_stub=False).first()
    expected = image_features(decode_jpeg(jpg), 16)
    assert np.allclose(row["features"], expected, atol=1e-6)
    rrow = resize_images(media, width=4, height=4, decode_stub=False).first()
    assert decode_png(rrow["content"]).shape == (4, 4, 3)
