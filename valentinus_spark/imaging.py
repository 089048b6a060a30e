"""Pure-stdlib PNG codec + image feature/resize kernels.

The container has no media libraries (PIL/av/soundfile), but PNG needs
only ``zlib`` + ``struct``, so the IMAGE half of the multimodal surface
can decode for real: this module implements a minimal, correct PNG
reader/writer (8-bit grayscale/RGB/RGBA, non-interlaced, all five scanline
filters) and the numpy kernels built on it (feature extraction,
nearest-neighbor resize). multimodal.py plugs these in at its
``decode_stub=False`` sites for ``image/png`` payloads; other modalities
and formats keep the documented NotImplementedError stubs.

Scale note: this codec is the CORRECTNESS path for the Spark plumbing
(mapInPandas batch shape, schema, round-trips in tests). A production
deployment swaps `decode_png` for a vectorized decoder (PIL-SIMD, nvJPEG)
behind the same signature — per-image Python cost dominates far below the
Arrow-batch transfer cost this module is shaped around.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → channel count (8-bit depth only; palette/interlace are out
# of scope for the stdlib codec and raise)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(data: bytes | None) -> bool:
    return bool(data) and data[:8] == _PNG_SIG


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (h, w, channels).

    Supports 8-bit grayscale (color type 0), RGB (2) and RGBA (6),
    non-interlaced, any combination of the five scanline filters
    (None/Sub/Up/Average/Paeth — each unfiltered per the PNG spec)."""
    if not is_png(data):
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
            if color not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {color} (0/2/6 supported)")
            if interlace:
                raise NotImplementedError("interlaced PNG not supported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        off = y * (stride + 1)
        filt = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if filt == 0:  # None
            cur = line
        elif filt == 1:  # Sub
            cur = line
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif filt == 2:  # Up
            cur = (line + prev) & 0xFF
        elif filt == 3:  # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {filt}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, channels∈{1,3,4}) → PNG bytes
    (filter 0 on every scanline, one zlib-deflated IDAT)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"unsupported channel count {c}")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def image_features(arr: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic real-image features: [h, w, channels, global mean,
    global std] (all scaled to ~[0,1]) followed by a mean-pooled grayscale
    grid flattened to fill ``dim``. Perceptually-close images get close
    vectors, so the output feeds the cosine near-dup/ANN operators."""
    h, w, c = arr.shape
    f = np.asarray(arr, dtype=np.float32) / 255.0
    gray = f.mean(axis=2)
    head = np.array(
        [h / 4096.0, w / 4096.0, c / 4.0, float(f.mean()), float(f.std())],
        dtype=np.float32,
    )
    ncell = max(dim - head.size, 0)
    if ncell == 0:
        return head[:dim]
    g = int(np.ceil(np.sqrt(ncell)))
    ys = (np.arange(g + 1) * h) // g
    xs = (np.arange(g + 1) * w) // g
    grid = np.empty(g * g, dtype=np.float32)
    for i in range(g):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(g):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            grid[i * g + j] = gray[y0:y1, x0:x1].mean()
    return np.concatenate([head, grid[:ncell]])


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via pure numpy fancy indexing (no loops)."""
    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[rows[:, None], cols[None, :]]


# --------------------------------------------------------------------------
# BMP (windows bitmap): the second real codec. Uncompressed BI_RGB only —
# which is essentially all of BMP in the wild — 24-bit BGR and 32-bit BGRA,
# bottom-up (positive height, the default) or top-down rows.
# --------------------------------------------------------------------------

_BMP_SIG = b"BM"


def is_bmp(data: bytes | None) -> bool:
    return bool(data) and data[:2] == _BMP_SIG


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 array of shape (h, w, 3|4) in RGB(A) order."""
    if not is_bmp(data):
        raise ValueError("not a BMP payload (bad signature)")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bpp not in (24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} (24/32 supported)")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    stride = (width * nch + 3) & ~3  # rows pad to 4 bytes
    need = pix_off + stride * height
    if len(data) < need:
        raise ValueError("BMP data length mismatch")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=pix_off
    ).reshape(height, stride)[:, : width * nch]
    img = rows.reshape(height, width, nch)
    if not top_down:
        img = img[::-1]
    # BGR(A) → RGB(A)
    if nch == 3:
        img = img[:, :, ::-1]
    else:
        img = img[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(img)


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 1|3|4) array → 24-bit bottom-up BMP bytes (alpha and
    grayscale are expanded/dropped to BGR — BMP's lingua franca)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if nch == 1:
        rgb = np.repeat(arr, 3, axis=2)
    elif nch == 4:
        rgb = arr[:, :, :3]
    else:
        rgb = arr
    bgr = rgb[:, :, ::-1]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bgr[y].tobytes()
        body += row + b"\x00" * (stride - len(row))
    pix_off = 14 + 40
    file_size = pix_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header + dib + body)
