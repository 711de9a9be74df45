"""Pure-NumPy baseline JPEG (JFIF) codec — no codec library.

Implements the baseline sequential DCT process of the public JPEG spec
(ITU-T T.81): 8x8 block DCT, uniform quantization (Annex K example quant
tables, quality-scaled per the common IJG rule), zigzag + DC-difference /
AC run-length entropy coding with canonical Huffman tables, JFIF marker
structure, 0xFF byte stuffing, and 4:4:4 or 4:2:0 chroma subsampling.

The DECODER is generic baseline: it builds Huffman tables from whatever
the DHT segments declare, reads sampling factors from SOF0, and handles
grayscale / 4:4:4 / 4:2:0 streams with optional restart intervals — i.e.
the structure a real-world baseline JPEG uses.  The ENCODER (used to
synthesize test payloads, since this sandbox ships no image files or
codec libraries) writes simple fixed-length canonical Huffman tables
rather than the Annex K defaults; any conforming decoder reads them from
the DHT segment just the same.

Scale note: this codec is the per-payload kernel behind the multimodal
``mapInPandas`` pipelines (multimodal.py) — decode cost is per-image and
embarrassingly parallel; no distributed machinery lives here.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (T.81 Figure 5): ZIGZAG[i] = natural index of the
# i-th coefficient in scan order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIG = np.argsort(ZIGZAG)

# Annex K example quantization tables (luminance / chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> base tables, 100 -> all ones."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    A = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    A[0] /= np.sqrt(2.0)
    return A


_A = _dct_matrix()


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


# ---------------------------------------------------------------------------
# Huffman tables: (bits, huffval) <-> canonical codes (T.81 Annex C)
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], huffval: list[int]) -> dict:
    """symbol -> (code, length) from the DHT (bits, huffval) form."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# Encoder-side tables: every DC size category (0..11) at 4 bits, every AC
# (run, size) byte at 9 bits — valid canonical prefix codes, declared in
# the DHT segments like any other table (the Annex K defaults are only
# *examples* in the spec; a decoder must read the DHT).
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = list(range(256))
_ENC_DC = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos:self.pos + 1]
                if nxt == b"\x00":
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy stream")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self._n = 0


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = r.read_bits(size)
    if v < (1 << (size - 1)):  # negative amplitude (T.81 F.2.2.1)
        v -= (1 << size) - 1
    return v


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _encode_block(w: _BitWriter, block: np.ndarray, q: np.ndarray,
                  dc_prev: int) -> int:
    coef = np.round(_dct2(block.astype(np.float64) - 128.0) / q).astype(
        np.int64)
    zz = coef.ravel()[ZIGZAG]
    dc = int(zz[0])
    diff = dc - dc_prev
    s = _size_cat(diff)
    code, length = _ENC_DC[s]
    w.write(code, length)
    if s:
        amp = diff if diff > 0 else diff + (1 << s) - 1
        w.write(amp, s)
    run = 0
    last_nz = int(np.flatnonzero(zz[1:]).max() + 1) if (zz[1:] != 0).any() \
        else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _ENC_AC[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s = _size_cat(v)
        code, length = _ENC_AC[(run << 4) | s]
        w.write(code, length)
        amp = v if v > 0 else v + (1 << s) - 1
        w.write(amp, s)
        run = 0
    if last_nz < 63:
        code, length = _ENC_AC[0x00]  # EOB
        w.write(code, length)
    return dc


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0,
                gray: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, or 4:2:0 with
    ``subsample=True``).  ``restart_interval`` emits a DRI segment and
    RSTn markers every that-many MCUs (the error-resilience feature real
    encoders use); ``gray=True`` writes a 1-component luminance-only
    stream."""
    h, w = pixels.shape[:2]
    ql = _scaled_quant(QUANT_LUMA, quality).astype(np.float64)
    qc = _scaled_quant(QUANT_CHROMA, quality).astype(np.float64)
    px = pixels.astype(np.float64)
    if gray:
        y = (px if px.ndim == 2
             else 0.299 * px[..., 0] + 0.587 * px[..., 1]
             + 0.114 * px[..., 2])
        cb = cr = np.zeros_like(y)
        subsample = False
    else:
        y = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        cb = (-0.168736 * px[..., 0] - 0.331264 * px[..., 1]
              + 0.5 * px[..., 2] + 128.0)
        cr = (0.5 * px[..., 0] - 0.418688 * px[..., 1]
              - 0.081312 * px[..., 2] + 128.0)
    if subsample:
        eh, ew = h + (h & 1), w + (w & 1)
        cb = _pad_to_blocks(cb, eh, ew).reshape(eh // 2, 2, ew // 2, 2) \
            .mean(axis=(1, 3))
        cr = _pad_to_blocks(cr, eh, ew).reshape(eh // 2, 2, ew // 2, 2) \
            .mean(axis=(1, 3))
        hs, vs = 2, 2
    else:
        hs, vs = 1, 1

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0
    for tid, q in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) \
            + bytes(int(v) for v in q.ravel()[ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w,
                                      ncomp)  # SOF0
    out += bytes([1, (hs << 4) | vs, 0])       # Y
    if not gray:
        out += bytes([2, 0x11, 1, 3, 0x11, 1])  # Cb, Cr
    for cls, tid, bits, vals in ((0, 0, _ENC_DC_BITS, _ENC_DC_VALS),
                                 (1, 0, _ENC_AC_BITS, _ENC_AC_VALS),
                                 (0, 1, _ENC_DC_BITS, _ENC_DC_VALS),
                                 (1, 1, _ENC_AC_BITS, _ENC_AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals),
                                         (cls << 4) | tid) \
            + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp) \
        + (bytes([1, 0x00]) if gray
           else bytes([1, 0x00, 2, 0x11, 3, 0x11])) \
        + bytes([0, 63, 0])  # SOS

    bw = _BitWriter()
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcols = (w + mcu_w - 1) // mcu_w
    mrows = (h + mcu_h - 1) // mcu_h
    yp = _pad_to_blocks(y, mrows * mcu_h, mcols * mcu_w)
    ch, cw = mrows * 8, mcols * 8
    cbp = _pad_to_blocks(cb, ch, cw)
    crp = _pad_to_blocks(cr, ch, cw)
    dc = [0, 0, 0]
    mcu_idx, rst = 0, 0
    for my in range(mrows):
        for mx in range(mcols):
            if restart_interval and mcu_idx \
                    and mcu_idx % restart_interval == 0:
                bw.flush()  # pad to byte, then an aligned RSTn marker
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                dc = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    r0, c0 = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                    dc[0] = _encode_block(
                        bw, yp[r0:r0 + 8, c0:c0 + 8], ql, dc[0])
            if not gray:
                r0, c0 = my * 8, mx * 8
                dc[1] = _encode_block(bw, cbp[r0:r0 + 8, c0:c0 + 8], qc,
                                      dc[1])
                dc[2] = _encode_block(bw, crp[r0:r0 + 8, c0:c0 + 8], qc,
                                      dc[2])
            mcu_idx += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (generic baseline: tables and sampling read from the stream)
# ---------------------------------------------------------------------------

def _decode_huff_symbol(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grayscale replicated).

    Supports: baseline sequential DCT (SOF0), 8-bit quant tables, 1 or 3
    components, 4:4:4 / 4:2:0 / grayscale sampling, restart intervals."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # 0xFF fill bytes before a marker are legal padding (T.81 B.1.1.2)
        while payload[pos + 1] == 0xFF and pos + 2 < len(payload):
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone markers with NO length segment
            continue
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if pos + seglen > len(payload):
            raise ValueError("truncated JPEG segment")
        seg = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:  # 16-bit table
                    vals = np.frombuffer(seg, dtype=">u2", count=64,
                                         offset=p).astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg, dtype=np.uint8, count=64,
                                         offset=p).astype(np.int64)
                    p += 64
                q = np.empty(64, dtype=np.int64)
                q[ZIGZAG] = vals
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                codes = _canonical_codes(bits, vals)
                htables[(tc, th)] = {(c, l): s for s, (c, l) in codes.items()}
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} "
                             "(baseline sequential only)")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(payload, pos, frame, scan, qtables,
                                htables, restart)
    raise ValueError("no SOS segment found")


def _decode_scan(payload: bytes, pos: int, frame, scan, qtables, htables,
                 restart: int) -> np.ndarray:
    if frame is None:
        raise ValueError("SOS before SOF0")
    fh, fw, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcols = (fw + mcu_w - 1) // mcu_w
    mrows = (fh + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        planes.append(np.zeros((mrows * c["v"] * 8, mcols * c["h"] * 8),
                               dtype=np.float64))
    r = _BitReader(payload, pos)
    dc = [0] * len(comps)
    mcu_idx = 0
    for my in range(mrows):
        for mx in range(mcols):
            if restart and mcu_idx and mcu_idx % restart == 0:
                r.align()  # scan to the aligned RSTn (skips pad/stuffing)
                while r.pos + 1 < len(payload) and not (
                        payload[r.pos] == 0xFF
                        and 0xD0 <= payload[r.pos + 1] <= 0xD7):
                    r.pos += 1
                if r.pos + 1 >= len(payload):
                    raise ValueError("missing restart marker")
                r.pos += 2
                dc = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = scan[c["id"]]
                dctab = htables[(0, dct)]
                actab = htables[(1, act)]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        s = _decode_huff_symbol(r, dctab)
                        dc[ci] += _receive_extend(r, s)
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = dc[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff_symbol(r, actab)
                            rrr, ssss = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rrr
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _receive_extend(r, ssss)
                            k += 1
                        coef = np.empty(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        block = _idct2(coef.reshape(8, 8) * q) + 128.0
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        planes[ci][r0:r0 + 8, c0:c0 + 8] = block
            mcu_idx += 1
    # upsample every component to full frame resolution (nearest)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
