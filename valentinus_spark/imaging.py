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
            if len(body) < 13:
                raise ValueError("truncated PNG IHDR chunk")
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
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
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # corrupt/truncated deflate stream must surface as the documented
        # ValueError, not a zlib internal (found by the r9 byte-fuzz
        # property layer)
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
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


# --------------------------------------------------------------------------
# GIF: third image codec. GIF87a/89a, global & local color tables, LZW
# decompression, interlacing, transparency index; animated GIFs decode
# their FIRST frame (the "image" semantics downstream features expect).
# --------------------------------------------------------------------------

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes | None) -> bool:
    return bool(data) and data[:6] in _GIF_SIGS


def _lzw_decode(mcs: int, data: bytes, n_expected: int) -> bytes:
    """GIF-variant LZW: variable code width starting at mcs+1, CLEAR and
    END control codes, dictionary capped at 4096 entries."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    # bit reader, LSB-first
    acc = 0
    nbits = 0
    pos = 0
    width = mcs + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while pos < len(data) or nbits >= width:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = dict_[code]
        elif code < len(dict_):
            entry = dict_[code]
            if len(dict_) < 4096:
                dict_.append(prev + entry[:1])
        elif code == len(dict_):
            entry = prev + prev[:1]
            if len(dict_) < 4096:
                dict_.append(entry)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        prev = entry
        if len(dict_) >= (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError("truncated GIF LZW data")
    return bytes(out[:n_expected])


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → uint8 (h, w, 4) RGBA of the first frame (alpha 0 only
    at the 89a transparency index, else 255)."""
    if not is_gif(data):
        raise ValueError("not a GIF payload (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    try:
        return _decode_gif(data)
    except (IndexError, struct.error, ValueError) as e:
        # corrupt block chains index off their buffers; surface the
        # documented ValueError, not a struct/numpy internal (r9
        # byte-fuzz property layer)
        if isinstance(e, ValueError):
            raise
        raise ValueError(f"corrupt GIF stream: {e!r}") from e


def _decode_gif(data: bytes) -> np.ndarray:
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    transparent = -1
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                flags, _delay, tindex = struct.unpack_from("<BHB", data, pos + 1)
                if flags & 1:
                    transparent = tindex
            while data[pos] != 0:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame without a color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            size = data[pos]
            lzw += data[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = np.frombuffer(_lzw_decode(mcs, bytes(lzw), w * h), dtype=np.uint8)
        if ipacked & 0x40:  # interlaced: 4-pass row order
            order = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                order.extend(range(start, h, step))
            rows = idx.reshape(h, w)
            deinter = np.empty_like(rows)
            deinter[np.array(order)] = rows
            idx = deinter.reshape(-1)
        idx = np.minimum(idx, len(table) - 1)
        rgba = np.empty((h, w, 4), dtype=np.uint8)
        rgba[:, :, :3] = table[idx].reshape(h, w, 3)
        rgba[:, :, 3] = 255
        if transparent >= 0:
            rgba[:, :, 3][idx.reshape(h, w) == transparent] = 0
        # first frame only; compose onto the logical screen if offset
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            screen = np.zeros((sh, sw, 4), dtype=np.uint8)
            screen[top : top + h, left : left + w] = rgba
            return screen
        return rgba
    raise ValueError("GIF contains no image frame")


def encode_gif(arr: np.ndarray) -> bytes:
    """uint8 (h, w) palette-index array + implicit grayscale palette →
    uncompressed-style GIF87a bytes (LZW with immediate CLEARs — valid,
    just not compact). Exists so the decoder is testable hermetically;
    use PNG for real output."""
    if arr.ndim != 2:
        raise ValueError("encode_gif takes a (h, w) uint8 index array")
    h, w = arr.shape
    header = b"GIF87a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    mcs = 8
    clear, end = 256, 257
    # emit each pixel as a 9-bit literal with CLEAR before every 254
    # codes so the dictionary never grows past 9-bit width
    codes: list[int] = [clear]
    for i, px in enumerate(arr.reshape(-1).tolist()):
        if i and i % 250 == 0:
            codes.append(clear)
        codes.append(px)
    codes.append(end)
    acc = nbits = 0
    payload = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        payload.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0) + bytes([mcs]) + bytes(blocks) + b"\x00"
    return header + palette + img + b"\x3b"
