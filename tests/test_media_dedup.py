"""Perceptual image dedup (operators/media_dedup.py): dHash kernel,
decode dispatch, banded Hamming join."""

import numpy as np
import pytest
from pyspark.sql import Row

from valentinus_spark.operators.media_dedup import (
    dhash_bits,
    dhash_near_pairs,
    image_dhash,
)


def _photo(seed=50, h=32, w=32):
    """Smooth 'photo-like' image: random low-frequency gradients."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for c in range(3):
        a, b, ph = rng.uniform(0.5, 2, 3)
        img[:, :, c] = 128 + 100 * np.sin(a * xx / w * 3 + ph) * np.cos(b * yy / h * 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def _hamming(a, b):
    return bin(a ^ b).count("1")


def test_dhash_stable_across_reencoding_and_resize():
    from valentinus_spark.imaging import resize_nearest
    from valentinus_spark.jpeg import decode_jpeg, encode_jpeg

    img = _photo()
    base = dhash_bits(img)
    # jpeg round trip (lossy!) must barely move the hash
    jpeg_rt = dhash_bits(decode_jpeg(encode_jpeg(img)))
    assert _hamming(base, jpeg_rt) <= 4
    # 2x downscale keeps the structure
    small = dhash_bits(resize_nearest(img, 16, 16))
    assert _hamming(base, small) <= 8
    # a different photo is far away
    other = dhash_bits(_photo(seed=51))
    assert _hamming(base, other) > 12


def test_image_dhash_decodes_all_containers(spark):
    from valentinus_spark.imaging import encode_bmp, encode_gif, encode_png
    from valentinus_spark.jpeg import encode_jpeg

    img = _photo(seed=52)
    gray_idx = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]).astype(np.uint8)
    rows = [
        ("png", bytearray(encode_png(img))),
        ("bmp", bytearray(encode_bmp(img))),
        ("jpg", bytearray(encode_jpeg(img))),
        ("gif", bytearray(encode_gif(gray_idx))),
        ("bad", bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r["media_id"]: r for r in image_dhash(df).collect()}
    # lossless containers agree exactly; jpeg within a few bits
    assert out["png"]["dhash"] == out["bmp"]["dhash"]
    assert _hamming(out["png"]["dhash"], out["jpg"]["dhash"]) <= 4
    # gif carries the gray-luma version of the same photo: still close
    assert _hamming(out["png"]["dhash"], out["gif"]["dhash"]) <= 10
    assert out["bad"]["dhash"] is None and "NotImplementedError" in out["bad"]["decode_error"]


def test_dhash_near_pairs_banded_matches_brute_force(spark):
    rng = np.random.default_rng(53)
    base = int(rng.integers(0, 1 << 62))

    def flip(h, bits):
        for b in bits:
            h ^= 1 << b
        return h

    rows = [
        Row(media_id="a", dhash=base),
        Row(media_id="b", dhash=flip(base, [3])),          # 1 bit
        Row(media_id="c", dhash=flip(base, [10, 40, 55])),  # 3 bits
        Row(media_id="d", dhash=flip(base, list(range(0, 60, 4)))),  # 15 bits
        Row(media_id="e", dhash=None),  # quarantined row: ignored
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_near_pairs(df, max_bits=6, n_bands=8).collect()
    }
    hs = {r.media_id: r.dhash for r in rows if r.dhash is not None}
    want = {}
    for x in sorted(hs):
        for y in sorted(hs):
            if x < y and _hamming(hs[x], hs[y]) <= 6:
                want[(x, y)] = _hamming(hs[x], hs[y])
    assert got == want
    assert ("a", "b") in got and got[("a", "b")] == 1
    assert ("a", "c") in got and got[("a", "c")] == 3
    assert not any("d" in p or "e" in p for p in got)


def test_dhash_near_pairs_validates_pigeonhole(spark):
    df = spark.createDataFrame([Row(media_id="x", dhash=1)])
    with pytest.raises(ValueError):
        dhash_near_pairs(df, max_bits=8, n_bands=8)


def test_end_to_end_image_neardup(spark):
    """Full pipeline: encode variants -> dhash -> banded join finds the
    re-encoded pair and not the unrelated image."""
    from valentinus_spark.imaging import encode_png
    from valentinus_spark.jpeg import encode_jpeg

    img = _photo(seed=54)
    rows = [
        ("orig", bytearray(encode_png(img))),
        ("reenc", bytearray(encode_jpeg(img))),
        ("other", bytearray(encode_png(_photo(seed=55)))),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    pairs = dhash_near_pairs(image_dhash(df), max_bits=6, n_bands=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("orig", "reenc") in found
    assert not any("other" in p for p in found)


def _tone_mix(seed=60, rate=8000, secs=0.5):
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * secs)) / rate
    x = np.zeros_like(t)
    for f, a in zip(rng.uniform(100, 3000, 4), rng.uniform(0.1, 0.3, 4)):
        x += a * np.sin(2 * np.pi * f * t)
    return np.clip(x, -1, 1).astype(np.float32)


def test_audio_fingerprint_robust_to_gain_and_requant():
    from valentinus_spark.audio import decode_wav, encode_wav
    from valentinus_spark.operators.media_dedup import audio_fingerprint_bits

    x = _tone_mix()
    base = audio_fingerprint_bits(x, 8000)
    # 16-bit encode/decode round trip: hash must survive
    rt, rate = decode_wav(encode_wav(x, 8000))
    assert _hamming(base, audio_fingerprint_bits(rt, rate)) <= 2
    # half the volume: comparisons are scale-free
    assert _hamming(base, audio_fingerprint_bits(x * 0.5, 8000)) <= 2
    # different content is far
    other = audio_fingerprint_bits(_tone_mix(seed=61), 8000)
    assert _hamming(base, other) > 8


def test_audio_fingerprint_spark_pipeline(spark):
    from valentinus_spark.audio import encode_wav
    from valentinus_spark.operators.media_dedup import (
        audio_fingerprint,
        dhash_near_pairs,
    )

    x = _tone_mix(seed=62)
    rows = [
        ("orig", bytearray(encode_wav(x, 8000))),
        ("quiet", bytearray(encode_wav(x * 0.4, 8000))),
        ("other", bytearray(encode_wav(_tone_mix(seed=63), 8000))),
        ("bad", bytearray(b"mp3-ish junk")),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    hashed = audio_fingerprint(df)
    out = {r["media_id"]: r for r in hashed.collect()}
    assert out["bad"]["ahash"] is None
    pairs = dhash_near_pairs(
        hashed, max_bits=4, n_bands=8, hash_col="ahash"
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("orig", "quiet") in found
    assert not any("other" in p or "bad" in p for p in found)


def test_planted_media_queries_recover_exact_pair_sets(spark):
    """The driver-gate planted queries (registry: media_dhash_planted,
    audio_fp_planted, video_frame_manifest) must recover exactly the
    doc_id-arithmetic ground truth at the default SF — standing pytest
    twin of the DuckDB oracle so codec/hash regressions fail locally."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    img = {
        tuple(r)
        for r in entry.q_media_dhash_planted(spark, SF_DIR).collect()
    }
    aud = {
        tuple(r) for r in entry.q_audio_fp_planted(spark, SF_DIR).collect()
    }
    expected_img = {
        (f"m{i:03d}", f"m{j:03d}")
        for i in range(60)
        for j in range(i + 1, 60)
        if i % 20 == j % 20
    }
    assert img == expected_img
    assert aud == {
        (f"a{i:03d}", f"a{j:03d}")
        for i in range(60)
        for j in range(i + 1, 60)
        if i % 20 == j % 20
    }
    frames = {
        tuple(r) for r in entry.q_video_frame_manifest(spark, SF_DIR).collect()
    }
    expected_frames = {
        (f"v{d:03d}", fn)
        for d in range(40)
        for fn in range(0, 4 + d % 5, 2)
    }
    assert frames == expected_frames


def test_phash_brightness_shift_invariant_and_structure_sensitive():
    """pHash drops the DC term, so a global +40 brightness shift (no
    clipping) leaves the hash IDENTICAL; a structurally different image
    must be far in Hamming distance."""
    import numpy as np

    from valentinus_spark.operators.media_dedup import phash_bits

    rng = np.random.RandomState(7)
    base = (rng.rand(64, 64) * 150 + 30).astype(np.uint8)
    shifted = np.clip(base.astype(np.int32) + 40, 0, 255).astype(np.uint8)
    other = (rng.rand(64, 64) * 150 + 30).astype(np.uint8)

    h_base = phash_bits(base)
    h_shift = phash_bits(shifted)
    h_other = phash_bits(other)
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(h_base, h_shift) <= 2  # brightness shift ~invariant
    assert ham(h_base, h_other) >= 15  # different content far away


def test_image_phash_pipeline_on_planted_bmp(spark):
    """Real decode -> phash over tiny synthetic BMPs; same-content
    re-encodes collide, distinct content does not."""
    import numpy as np

    from valentinus_spark.imaging import encode_bmp
    from valentinus_spark.operators.media_dedup import image_phash

    rng = np.random.RandomState(3)
    img_a = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    img_b = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    rows = [
        ("a1", bytearray(encode_bmp(img_a))),
        ("a2", bytearray(encode_bmp(img_a))),
        ("b1", bytearray(encode_bmp(img_b))),
    ]
    df = spark.createDataFrame(rows, ["media_id", "content"])
    got = {r.media_id: r.phash for r in image_phash(df, on_error="raise").collect()}
    assert got["a1"] == got["a2"]
    assert got["a1"] != got["b1"]
