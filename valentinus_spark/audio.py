"""Pure-stdlib WAV codec + audio feature kernels.

Completes the multimodal decode story for the audio modality the same
way imaging.py did for images: RIFF/WAVE PCM is a struct-level format
(no codec library needed), so ``decode_stub=False`` paths can decode
REAL audio payloads in this container. A production deployment swaps
these kernels for soundfile/librosa equivalents; the mapInPandas batch
shape — bytes → numpy → fixed-dim features — is the contract and stays
unchanged.

Scope: PCM integer WAV (8/16/32-bit) and IEEE float32, mono or
multi-channel (downmixed by mean). Compressed WAV (ADPCM, mu-law) raises
NotImplementedError at the marked site.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def is_wav(data: bytes | None) -> bool:
    return bool(data) and len(data) >= 12 and data[:4] == _RIFF and data[8:12] == _WAVE


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 mono samples in [-1, 1], sample_rate).

    Walks the RIFF chunk list (fmt/data may be preceded by LIST/fact
    chunks); multi-channel audio is downmixed by per-frame mean."""
    if not is_wav(data):
        raise ValueError("not a WAV payload (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                # truncated fmt chunk must surface as the documented
                # ValueError, not struct.error (r9 byte-fuzz property)
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("truncated WAV (missing fmt or data chunk)")
    audio_format, n_channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format == 1:  # integer PCM
        if bits == 8:  # unsigned
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise NotImplementedError(f"PCM bit depth {bits} (8/16/32 supported)")
    elif audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    else:
        raise NotImplementedError(
            f"WAV format {audio_format}/{bits}-bit (PCM or float32 supported)"
        )
    if n_channels > 1:
        usable = (x.size // n_channels) * n_channels
        x = x[:usable].reshape(-1, n_channels).mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32), int(sample_rate)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float mono samples in [-1, 1] → 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    raw = ints.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return _RIFF + struct.pack("<I", 4 + len(chunks)) + _WAVE + chunks


def audio_features(samples: np.ndarray, sample_rate: int, dim: int) -> np.ndarray:
    """Fixed-dim deterministic audio descriptor: the signal is split into
    ``dim // 4`` equal windows; per window — RMS energy, zero-crossing
    rate, spectral centroid, and spectral rolloff (85%) — all normalized
    to [0, 1]-ish ranges. Cheap, library-free, and stable: the same
    bytes give the same vector on every executor, which is what the
    dedup/similarity operators downstream need."""
    n_win = max(1, dim // 4)
    out = np.zeros(n_win * 4, dtype=np.float32)
    if samples.size == 0:
        return out[:dim] if out.size >= dim else np.pad(out, (0, dim - out.size))
    windows = np.array_split(samples.astype(np.float64), n_win)
    nyq = sample_rate / 2.0
    for i, w in enumerate(windows):
        if w.size == 0:
            continue
        rms = float(np.sqrt(np.mean(w**2)))
        zcr = float(np.mean(np.abs(np.diff(np.signbit(w)).astype(np.float64)))) if w.size > 1 else 0.0
        mag = np.abs(np.fft.rfft(w))
        freqs = np.fft.rfftfreq(w.size, d=1.0 / sample_rate)
        tot = float(mag.sum())
        if tot > 0:
            centroid = float((freqs * mag).sum() / tot) / nyq
            cum = np.cumsum(mag)
            rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * tot))]) / nyq
        else:
            centroid = rolloff = 0.0
        out[i * 4 : i * 4 + 4] = (rms, zcr, centroid, rolloff)
    if out.size < dim:
        out = np.pad(out, (0, dim - out.size))
    return out[:dim].astype(np.float32)
