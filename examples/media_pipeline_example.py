"""Media-pipeline tour: real codecs, feature extraction, perceptual dedup.

    synthesize PNG/BMP/JPEG/GIF images + WAV audio + Y4M video payloads
      → extract_media_features (real decode, per-row error quarantine)
      → image dHash + banded Hamming near-dup pairs
      → audio spectral fingerprints through the same join

Run: python examples/media_pipeline_example.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np

from valentinus_spark import get_spark
from valentinus_spark.audio import encode_wav
from valentinus_spark.imaging import encode_png
from valentinus_spark.jpeg import encode_jpeg
from valentinus_spark.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    sample_video_frames,
)
from valentinus_spark.operators import (
    audio_fingerprint,
    dhash_near_pairs,
    image_dhash,
)
from valentinus_spark.video import encode_y4m


def _photo(seed, h=32, w=32):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for c in range(3):
        a, b, ph = rng.uniform(0.5, 2, 3)
        img[:, :, c] = 128 + 100 * np.sin(a * xx / w * 3 + ph) * np.cos(b * yy / h * 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def _tone(seed, rate=8000):
    rng = np.random.default_rng(seed)
    t = np.arange(rate // 2) / rate
    x = sum(
        a * np.sin(2 * np.pi * f * t)
        for f, a in zip(rng.uniform(100, 3000, 4), rng.uniform(0.1, 0.3, 4))
    )
    return np.clip(x, -1, 1).astype(np.float32)


def main() -> None:
    spark = get_spark("media-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    img = _photo(1)
    frames = [np.full((16, 16), 16 * i, dtype=np.uint8) for i in range(12)]
    media = spark.createDataFrame(
        [
            ("img-png", "image", bytearray(encode_png(img)), None),
            ("img-jpg", "image", bytearray(encode_jpeg(img)), None),  # re-encoded dup
            ("img-other", "image", bytearray(encode_png(_photo(2))), None),
            ("img-corrupt", "image", bytearray(b"\x89PNG\r\n\x1a\nxx"), None),
            ("aud-wav", "audio", bytearray(encode_wav(_tone(3))), None),
            ("vid-y4m", "video", bytearray(encode_y4m(frames)), None),
        ],
        MEDIA_SCHEMA,
    )

    print("== real decode + quarantine (features trimmed) ==")
    extract_media_features(media, dim=8, decode_stub=False, on_error="null").select(
        "media_id", "modality", "n_bytes", "decode_error"
    ).show(truncate=40)

    print("== image near-dups via dHash banded Hamming join ==")
    images = media.where("modality = 'image'")
    dhash_near_pairs(image_dhash(images), max_bits=6, n_bands=8).show()

    print("== audio fingerprints through the SAME join ==")
    audio = media.where("modality = 'audio'")
    dhash_near_pairs(
        audio_fingerprint(audio), max_bits=4, n_bands=8, hash_col="ahash"
    ).show()

    print("== video frame sampling (every 5th of 12 Y4M frames) ==")
    sample_video_frames(media.where("modality = 'video'"), every_n=5, decode_stub=False).select(
        "media_id", "frame_no"
    ).show()


if __name__ == "__main__":
    main()
