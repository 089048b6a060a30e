"""Pure-stdlib PNG codec tests (valentinus_spark/imaging.py) and the real
(non-stub) image decode path through the Spark multimodal operators."""

import struct
import zlib

import numpy as np
import pytest

from valentinus_spark.imaging import (
    decode_png,
    encode_png,
    image_features,
    is_png,
    resize_nearest,
)


def _rand_img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(channels):
    img = _rand_img(13, 7, channels, seed=channels)
    data = encode_png(img)
    assert is_png(data)
    back = decode_png(data)
    assert back.shape == (13, 7, channels)
    assert np.array_equal(back, img)


def _forward_filter(img: np.ndarray, filt: int) -> bytes:
    """Apply a PNG scanline filter FORWARD (spec §9) to build a stream the
    decoder must invert — our encoder only emits filter 0, so the other
    four are exercised via this independent reference implementation."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int64)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = flat[y]
        enc = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = line[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = a
            elif filt == 2:
                pred = b
            elif filt == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[i] = (line[i] - pred) & 0xFF
        out.append(filt)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = line
    return bytes(out)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_all_scanline_filters_decode(filt):
    img = _rand_img(9, 5, 3, seed=filt + 10)
    raw = _forward_filter(img, filt)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 9, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    assert not is_png(b"") and not is_png(None)


def test_resize_nearest_exact():
    img = np.array([[[0], [10]], [[20], [30]]], dtype=np.uint8)  # 2x2 gray
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 1)
    # each source pixel becomes a 2x2 block
    assert np.array_equal(up[:2, :2, 0], np.zeros((2, 2))) and up[3, 3, 0] == 30
    down = resize_nearest(up, 2, 2)
    assert np.array_equal(down, img)


def test_image_features_shape_and_locality():
    base = _rand_img(16, 16, 3, seed=1)
    near = base.copy()
    near[0, 0] = [255, 255, 255]  # one-pixel change
    far = _rand_img(16, 16, 3, seed=2)
    fb, fn, ff = (image_features(x, 32) for x in (base, near, far))
    assert fb.shape == (32,)

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(fb, fn) > cos(fb, ff)
    assert cos(fb, fn) > 0.99


def test_spark_real_png_features(spark):
    from valentinus_spark.multimodal import MEDIA_SCHEMA, extract_media_features

    png1 = encode_png(_rand_img(12, 12, 3, seed=3))
    png2 = encode_png(_rand_img(12, 12, 3, seed=4))
    media = spark.createDataFrame(
        [("p1", "image", png1, None), ("p2", "image", png2, None)], MEDIA_SCHEMA
    )
    out = {r["media_id"]: r for r in extract_media_features(media, dim=16, decode_stub=False).collect()}
    assert len(out) == 2
    # real decode: features must match the local kernel exactly
    expected = image_features(decode_png(png1), 16)
    assert np.allclose(out["p1"]["features"], expected, atol=1e-6)
    assert out["p1"]["features"] != out["p2"]["features"]


def test_spark_real_png_resize_roundtrip(spark):
    from valentinus_spark.multimodal import MEDIA_SCHEMA, resize_images

    img = _rand_img(10, 6, 4, seed=5)  # RGBA
    media = spark.createDataFrame(
        [("r1", "image", encode_png(img), None)], MEDIA_SCHEMA
    )
    row = resize_images(media, width=3, height=5, decode_stub=False).first()
    assert row["meta"] == {"width": "3", "height": "5", "channels": "4"}
    back = decode_png(row["content"])
    assert back.shape == (5, 3, 4)
    assert np.array_equal(back, resize_nearest(img, 3, 5))


def test_spark_non_png_still_raises(spark):
    from pyspark.sql.utils import PythonException

    from valentinus_spark.multimodal import MEDIA_SCHEMA, extract_media_features

    media = spark.createDataFrame(
        [("w1", "image", b"RIFF....WEBPVP8 unsupported", None)], MEDIA_SCHEMA
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_media_features(media, decode_stub=False).collect()


# --------------------------------------------------------------------------
# BMP codec
# --------------------------------------------------------------------------


def test_bmp_roundtrip_rgb():
    from valentinus_spark.imaging import decode_bmp, encode_bmp, is_bmp

    img = _rand_img(7, 5, 3, seed=11)
    data = encode_bmp(img)
    assert is_bmp(data) and not is_png(data)
    assert np.array_equal(decode_bmp(data), img)


def test_bmp_row_padding_and_inputs():
    from valentinus_spark.imaging import decode_bmp, encode_bmp

    # width 3 * 3 bytes = 9 -> padded to 12: exercises stride handling
    img = _rand_img(4, 3, 3, seed=12)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    gray = _rand_img(4, 4, 1, seed=13)[:, :, 0]
    assert decode_bmp(encode_bmp(gray)).shape == (4, 4, 3)
    rgba = _rand_img(2, 2, 4, seed=14)
    assert np.array_equal(decode_bmp(encode_bmp(rgba)), rgba[:, :, :3])


def test_bmp_top_down_and_32bit_decode():
    import struct as _s

    from valentinus_spark.imaging import decode_bmp

    # hand-build a 2x2 top-down 32-bit BGRA BMP
    px = [
        (10, 20, 30, 255), (40, 50, 60, 255),   # row 0 (top)
        (70, 80, 90, 255), (100, 110, 120, 255),
    ]
    body = b"".join(bytes([b, g, r, a]) for (r, g, b, a) in px)
    hdr = _s.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = _s.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(body), 0, 0, 0, 0)
    out = decode_bmp(hdr + dib + body)
    assert out.shape == (2, 2, 4)
    assert tuple(out[0, 0]) == (10, 20, 30, 255)
    assert tuple(out[1, 1]) == (100, 110, 120, 255)


def test_bmp_rejects_garbage_and_compressed():
    import struct as _s

    from valentinus_spark.imaging import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"nope")
    hdr = _s.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    dib = _s.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 1, 0, 0, 0, 0, 0)  # RLE
    with pytest.raises(NotImplementedError):
        decode_bmp(hdr + dib + b"\x00" * 8)


def test_spark_real_bmp_features_and_resize(spark):
    from valentinus_spark.imaging import decode_bmp, encode_bmp, resize_nearest
    from valentinus_spark.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        resize_images,
    )

    img = _rand_img(8, 6, 3, seed=15)
    media = spark.createDataFrame(
        [("b1", "image", encode_bmp(img), None)], MEDIA_SCHEMA
    )
    row = extract_media_features(media, dim=16, decode_stub=False).first()
    expected = image_features(decode_bmp(encode_bmp(img)), 16)
    assert np.allclose(row["features"], expected, atol=1e-6)
    rrow = resize_images(media, width=4, height=4, decode_stub=False).first()
    back = decode_png(rrow["content"])  # resize re-encodes as PNG
    assert np.array_equal(back, resize_nearest(img, 4, 4))


# --------------------------------------------------------------------------
# GIF codec
# --------------------------------------------------------------------------


def test_gif_roundtrip_grayscale_palette():
    from valentinus_spark.imaging import decode_gif, encode_gif, is_gif

    rng = np.random.default_rng(31)
    idx = rng.integers(0, 256, (11, 7), dtype=np.uint8)
    data = encode_gif(idx)
    assert is_gif(data) and not is_png(data)
    out = decode_gif(data)
    assert out.shape == (11, 7, 4)
    assert np.array_equal(out[:, :, 0], idx)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])  # gray palette
    assert (out[:, :, 3] == 255).all()


def test_gif_interlaced_decode():
    from valentinus_spark.imaging import decode_gif, encode_gif

    rng = np.random.default_rng(32)
    idx = rng.integers(0, 256, (10, 4), dtype=np.uint8)
    h = idx.shape[0]
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    # store rows in interlace order, then flip the interlace flag
    data = bytearray(encode_gif(idx[np.array(order)]))
    img_desc = data.index(0x2C, 13 + 768)  # after header + palette
    data[img_desc + 9] |= 0x40
    out = decode_gif(bytes(data))
    assert np.array_equal(out[:, :, 0], idx)


def test_gif_transparency_index():
    from valentinus_spark.imaging import decode_gif, encode_gif

    idx = np.array([[0, 5], [5, 0]], dtype=np.uint8)
    data = encode_gif(idx)
    # splice in an 89a graphic-control extension marking index 5 transparent
    gce = b"\x21\xf9\x04\x01\x00\x00\x05\x00"
    img_desc = data.index(b"\x2c", 13 + 768)
    data = b"GIF89a" + data[6:img_desc] + gce + data[img_desc:]
    out = decode_gif(data)
    assert out[0, 0, 3] == 255 and out[0, 1, 3] == 0
    assert out[1, 0, 3] == 0 and out[1, 1, 3] == 255


def test_gif_rejects_garbage():
    from valentinus_spark.imaging import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"JIF89a nope")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4)


def test_spark_real_gif_features(spark):
    from valentinus_spark.imaging import decode_gif, encode_gif
    from valentinus_spark.multimodal import MEDIA_SCHEMA, extract_media_features

    idx = np.arange(64, dtype=np.uint8).reshape(8, 8)
    gif = encode_gif(idx)
    media = spark.createDataFrame([("g1", "image", gif, None)], MEDIA_SCHEMA)
    row = extract_media_features(media, dim=16, decode_stub=False).first()
    expected = image_features(decode_gif(gif), 16)
    assert np.allclose(row["features"], expected, atol=1e-6)
