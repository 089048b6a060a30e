"""Pure numpy/stdlib baseline JPEG codec.

JPEG is the format a web-crawl media corpus is mostly made of, so the
decode path matters more than any other. This implements the baseline
sequential DCT process (ITU T.81): 8-bit samples, Huffman entropy
coding, YCbCr, 4:4:4 / 4:2:2 / 4:2:0 chroma sampling, restart markers.
Progressive, arithmetic-coded, and 12-bit variants raise
NotImplementedError (they are the marked plug-in site for libjpeg-turbo
/ PIL in a full deployment).

The companion encoder exists to make the decoder hermetically testable
(no JPEG fixtures can be shipped, and PIL is absent): it emits valid
baseline streams with canonical Huffman tables built from fixed
BITS/HUFFVAL lists — the decoder consumes the tables from the DHT
segments like any other stream, so round trips exercise the real
parsing path. Compression quality is not the point; validity is.

Everything here is per-payload CPU work inside ``mapInPandas`` batches
(multimodal.py) — no Spark-side structure changes.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag scan order, generated (T.81 figure 5)."""
    order = []
    for s in range(15):
        cells = [(i, s - i) for i in range(min(s, 7), max(0, s - 7) - 1, -1)]
        if s % 2:  # odd diagonals run top-right -> bottom-left
            cells.reverse()
        order.extend(i * 8 + j for i, j in cells)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag_order()
_UNZZ = np.argsort(_ZZ)

# orthonormal 8-point DCT-II matrix
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(1.0 / 8) if _k == 0 else np.sqrt(2.0 / 8)
    _C[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)

# quantization tables: Annex K-shaped luma ramp kept simple and mild so
# encode->decode error on smooth content stays small. Both are embedded
# in DQT, so any values are valid streams.
_QL = np.clip(np.add.outer(np.arange(8), np.arange(8)) * 3 + 8, 8, 60).astype(np.uint8)
_QC = np.clip(np.add.outer(np.arange(8), np.arange(8)) * 4 + 12, 12, 80).astype(np.uint8)

# canonical Huffman tables for the encoder: every DC category at 4 bits,
# every AC symbol at 9 bits — valid canonical codes (12 <= 2^4 - 1 slack
# not needed at shorter lengths; 176 < 2^9), embedded via DHT and read
# back generically by the decoder.
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_BITS = [0] * 8 + [len(_AC_VALS)] + [0] * 7


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG construction."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def is_jpeg(data: bytes | None) -> bool:
    return bool(data) and data[:2] == b"\xff\xd8"


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn: caller resyncs
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self):
        """Skip to just past the next RST marker and reset bit state."""
        # drop buffered bits, scan for 0xFF D0-D7
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.marker = None
                return
            p += 1
        raise ValueError("expected JPEG restart marker")


def _build_decode_table(bits: list[int], vals: list[int]):
    """(code, length) -> symbol lookup dict keyed by (length, code)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG Huffman stream")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 (h, w, 3) RGB (grayscale expands)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload (bad SOI)")
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, OverflowError, struct.error) as e:
        # corrupt/truncated segment tables or entropy streams index off
        # the end of their buffers; surface the documented ValueError,
        # not a numpy/struct internal (r9 byte-fuzz property layer)
        raise ValueError(f"corrupt JPEG stream: {e!r}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them or the next byte pair misparses as a
        # length field (real crawl JPEGs pad this way)
        while data[pos + 1] == 0xFF and pos + 4 <= len(data):
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                qt[tq] = (
                    np.frombuffer(seg, dtype=np.uint8, count=64, offset=p + 1)
                    .astype(np.int32)[_UNZZ]
                    .reshape(8, 8)
                )
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += seglen
    raise ValueError("JPEG contains no scan")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        )
    by_id = {s["cs"]: s for s in scan}
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                s = by_id[c["id"]]
                dct_t = huff_dc[s["td"]]
                act_t = huff_ac[s["ta"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(reader, dct_t)
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        coefs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, act_t)
                            r, ssss = rs >> 4, rs & 0xF
                            if ssss == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coefs[k] = _extend(reader.receive(ssss), ssss)
                            k += 1
                        block = (coefs[_UNZZ].reshape(8, 8) * q).astype(np.float64)
                        pix = _C.T @ block @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            n_mcu += 1
    # upsample to full res and convert
    full = []
    for c, p in zip(comps, planes):
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (hermetic-test companion)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(
    arr: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """uint8 (h, w, 3) RGB (or (h, w) gray) → baseline JPEG bytes,
    4:4:4 by default or 4:2:0 with ``subsample=True``;
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (the resynchronization points hardened decoders rely
    on for corrupt-tail streams)."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w = arr.shape[:2]
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128

    if subsample:
        sh, sv = 2, 2
    else:
        sh = sv = 1
    # pad planes to MCU multiples
    mcu_h, mcu_w = 8 * sv, 8 * sh

    def pad(p, mh, mw):
        ph = (-p.shape[0]) % mh
        pw = (-p.shape[1]) % mw
        return np.pad(p, ((0, ph), (0, pw)), mode="edge")

    yp = pad(y, mcu_h, mcu_w)
    if subsample:
        che = pad(cb, mcu_h, mcu_w)
        cre = pad(cr, mcu_h, mcu_w)
        cbp = che.reshape(che.shape[0] // 2, 2, che.shape[1] // 2, 2).mean(axis=(1, 3))
        crp = cre.reshape(cre.shape[0] // 2, 2, cre.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cbp, crp = pad(cb, 8, 8), pad(cr, 8, 8)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    wtr = _BitWriter()
    pred = [0, 0, 0]

    def emit_block(plane, y0, x0, q, ci):
        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        coefs = _C @ block @ _C.T
        qc = np.round(coefs / q).astype(np.int32).reshape(-1)[_ZZ]
        diff = int(qc[0]) - pred[ci]
        pred[ci] = int(qc[0])
        t = _category(diff)
        code, ln = dc_codes[t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            v = int(qc[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                wtr.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = ac_codes[0x00]
            wtr.write(code, ln)

    qly = _QL.astype(np.float64).reshape(8, 8)
    qcc = _QC.astype(np.float64).reshape(8, 8)
    mcux = yp.shape[1] // mcu_w
    mcuy = yp.shape[0] // mcu_h
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred[0] = pred[1] = pred[2] = 0
            for by in range(sv):
                for bx in range(sh):
                    emit_block(yp, my * mcu_h + by * 8, mx * mcu_w + bx * 8, qly, 0)
            emit_block(cbp, my * 8, mx * 8, qcc, 1)
            emit_block(crp, my * 8, mx * 8, qcc, 2)
            n_mcu += 1
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(table.reshape(-1)[_ZZ].astype(np.uint8)))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3])
        + bytes([1, (sh << 4) | sv, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    return (
        b"\xff\xd8"
        + dri
        + dqt(0, _QL.astype(np.int32))
        + dqt(1, _QC.astype(np.int32))
        + dht(0, 0, _DC_BITS, _DC_VALS)
        + dht(0, 1, _DC_BITS, _DC_VALS)
        + dht(1, 0, _AC_BITS, _AC_VALS)
        + dht(1, 1, _AC_BITS, _AC_VALS)
        + sof
        + sos
        + bytes(wtr.out)
        + b"\xff\xd9"
    )
