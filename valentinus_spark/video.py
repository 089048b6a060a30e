"""Pure-stdlib Y4M (yuv4mpeg2) codec + frame feature path.

Completes the per-modality real-decode story: images (PNG/BMP,
imaging.py), audio (WAV, audio.py), and now video. Y4M is ffmpeg's
uncompressed interchange format — an ASCII header (``YUV4MPEG2 W.. H..
F.. ...``) followed by ``FRAME``-delimited raw planar YUV — so decoding
is header parsing plus buffer slicing, no codec library required. A
production deployment swaps this for ``av`` (and gets H.264 etc.); the
mapInPandas fan-out shape (one video row → N frame rows) is the
contract and stays unchanged.

Scope: C420 (default, including C420jpeg/C420mpeg2/C420paldv tags) and
C444; other chroma samplings raise at the marked site. Frame features
use the luma (Y) plane — brightness structure is what frame-level
dedup/sampling keys on.
"""

from __future__ import annotations

import numpy as np

_SIG = b"YUV4MPEG2 "


def is_y4m(data: bytes | None) -> bool:
    return bool(data) and data[: len(_SIG)] == _SIG


def decode_y4m(data: bytes) -> tuple[list[np.ndarray], tuple[int, int]]:
    """Y4M bytes → (list of (h, w) uint8 luma frames, (fps_num, fps_den)).

    Only the Y plane is materialized per frame; chroma planes are sized
    from the sampling tag and skipped over."""
    if not is_y4m(data):
        raise ValueError("not a Y4M payload (bad YUV4MPEG2 signature)")
    nl = data.index(b"\n")
    header = data[len(_SIG) : nl].decode("ascii", "replace")
    width = height = None
    fps = (25, 1)
    chroma = "420"
    for tok in header.split():
        if tok[:1] == "W":
            width = int(tok[1:])
        elif tok[:1] == "H":
            height = int(tok[1:])
        elif tok[:1] == "F":
            num, den = tok[1:].split(":")
            fps = (int(num), int(den))
        elif tok[:1] == "C":
            chroma = tok[1:]
    if width is None or height is None:
        raise ValueError("Y4M header missing W or H")
    if chroma.startswith("420"):
        # ceil-division: Y4M writers size odd-dimension C420 chroma
        # planes as ceil(w/2)*ceil(h/2); flooring desynchronizes the
        # frame walk on odd dims (ADVICE r3)
        chroma_bytes = ((width + 1) // 2) * ((height + 1) // 2) * 2
    elif chroma == "444":
        chroma_bytes = width * height * 2
    else:
        raise NotImplementedError(f"Y4M chroma sampling C{chroma}")
    y_bytes = width * height
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        fnl = data.index(b"\n", pos)
        pos = fnl + 1
        if pos + y_bytes + chroma_bytes > len(data):
            raise ValueError("truncated Y4M frame")
        y = np.frombuffer(data, dtype=np.uint8, count=y_bytes, offset=pos)
        frames.append(y.reshape(height, width).copy())
        pos += y_bytes + chroma_bytes
    return frames, fps


def encode_y4m(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1)) -> bytes:
    """(h, w) uint8 luma frames → C420 Y4M bytes (flat gray chroma)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n" % (w, h, fps[0], fps[1])
    )
    chroma = b"\x80" * ((w // 2) * (h // 2) * 2)  # neutral U+V planes
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one size")
        out += b"FRAME\n" + np.ascontiguousarray(f, dtype=np.uint8).tobytes() + chroma
    return bytes(out)
