"""Pure-NumPy JPEG (JFIF) codec — no codec library.

Implements the baseline sequential DCT process of the public JPEG spec
(ITU-T T.81): 8x8 block DCT, uniform quantization (Annex K example quant
tables, quality-scaled per the common IJG rule), zigzag + DC-difference /
AC run-length entropy coding with canonical Huffman tables, JFIF marker
structure, 0xFF byte stuffing, and 4:4:4 or 4:2:0 chroma subsampling —
plus the PROGRESSIVE DCT process (SOF2, Annex G): spectral selection and
successive approximation on both the decode and encode side, including
the AC correction-bit refinement scans.

The DECODER is generic: it builds Huffman tables from whatever the DHT
segments declare, reads sampling factors from SOF0/SOF2, and handles
grayscale / 4:4:4 / 4:2:0 streams with optional restart intervals — i.e.
the structure a real-world JPEG uses.  The ENCODER (used to
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


# ---------------------------------------------------------------------------
# Progressive encoding (SOF2): DC scan + per-component spectral bands, each
# at two successive-approximation levels (Al=1 then the Al=0 refinement) —
# exercises every progressive scan kind a real encoder emits.
# ---------------------------------------------------------------------------

def _plane_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) plane, multiples of 8 -> (bv, bh, 64) quantized zigzag
    coefficients via a batch DCT."""
    bv, bh_ = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bv, 8, bh_, 8).transpose(0, 2, 1, 3)
    c = np.einsum("ij,nmjk,kl->nmil", _A, blocks - 128.0, _A.T)
    return np.round(c / q).astype(np.int64).reshape(bv, bh_, 64)[..., ZIGZAG]


def _sos_header(comp_specs, ss: int, se: int, ah: int, al: int) -> bytes:
    ns = len(comp_specs)
    out = b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
    for cid, td, ta in comp_specs:
        out += bytes([cid, (td << 4) | ta])
    return out + bytes([ss, se, (ah << 4) | al])


def _emit_eobrun(w: _BitWriter, eobrun: int) -> int:
    """Flush an accumulated cross-block EOB run as EOBn symbols (each
    covers [2^rr, 2^(rr+1)) blocks via rr extension bits; max 32767)."""
    while eobrun > 0:
        chunk = min(eobrun, 32767)
        rr = chunk.bit_length() - 1
        code, length = _ENC_AC[rr << 4]
        w.write(code, length)
        if rr:
            w.write(chunk - (1 << rr), rr)
        eobrun -= chunk
    return 0


def _write_prog_dc_first(w, zzs, comps_hv, al: int) -> None:
    ncomp = len(zzs)
    mrows = zzs[0].shape[0] // comps_hv[0][1]
    mcols = zzs[0].shape[1] // comps_hv[0][0]
    preds = [0] * ncomp
    for my in range(mrows):
        for mx in range(mcols):
            for ci in range(ncomp):
                h_, v_ = comps_hv[ci]
                for by in range(v_):
                    for bx in range(h_):
                        # DC point transform is an ARITHMETIC shift
                        v = int(zzs[ci][my * v_ + by, mx * h_ + bx, 0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _size_cat(diff)
                        code, length = _ENC_DC[s]
                        w.write(code, length)
                        if s:
                            amp = diff if diff > 0 \
                                else diff + (1 << s) - 1
                            w.write(amp, s)


def _write_prog_dc_refine(w, zzs, comps_hv, al: int) -> None:
    mrows = zzs[0].shape[0] // comps_hv[0][1]
    mcols = zzs[0].shape[1] // comps_hv[0][0]
    for my in range(mrows):
        for mx in range(mcols):
            for ci, (h_, v_) in enumerate(comps_hv):
                for by in range(v_):
                    for bx in range(h_):
                        v = int(zzs[ci][my * v_ + by, mx * h_ + bx, 0])
                        w.write((v >> al) & 1, 1)


def _write_prog_ac_first(w, zz, nbr, nbc, ss, se, al: int) -> None:
    """AC 'first' scan: point transform is magnitude shift (toward zero);
    all-zero bands accumulate into cross-block EOB runs."""
    eobrun = 0
    for by in range(nbr):
        for bx in range(nbc):
            band = zz[by, bx, ss:se + 1]
            t = np.sign(band) * (np.abs(band) >> al)
            nzi = np.flatnonzero(t)
            if nzi.size == 0:
                eobrun += 1
                if eobrun == 32767:
                    eobrun = _emit_eobrun(w, eobrun)
                continue
            eobrun = _emit_eobrun(w, eobrun)
            run = 0
            last = int(nzi.max())
            for i in range(last + 1):
                v = int(t[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _ENC_AC[0xF0]
                    w.write(code, length)
                    run -= 16
                s = _size_cat(v)
                code, length = _ENC_AC[(run << 4) | s]
                w.write(code, length)
                amp = v if v > 0 else v + (1 << s) - 1
                w.write(amp, s)
                run = 0
            if last < se - ss:
                eobrun += 1
    _emit_eobrun(w, eobrun)


def _write_prog_ac_refine(w, zz, nbr, nbc, ss, se, al: int) -> None:
    """AC refinement scan (T.81 G.1.2.3): newly significant coefficients
    (|v|>>Al == 1) get (run, 1) symbols + a sign bit; already-nonzero
    coefficients passed over emit buffered correction bits, flushed after
    each symbol in the exact order the decoder's advance loop reads them.
    EOBs are emitted per block (no cross-block refinement runs) — legal,
    slightly less compact, and it keeps the bit buffer block-local."""
    for by in range(nbr):
        for bx in range(nbc):
            band = zz[by, bx, ss:se + 1]
            absv = np.abs(band) >> al
            newly = np.flatnonzero(absv == 1)
            eob_i = int(newly.max()) if newly.size else -1
            run = 0
            br: list[int] = []
            for i in range(band.size):
                t = int(absv[i])
                if t == 0:
                    run += 1
                    continue
                # ZRLs only when another newly-significant coefficient
                # follows; trailing zeros fold into the EOB instead
                while run > 15 and i <= eob_i:
                    code, length = _ENC_AC[0xF0]
                    w.write(code, length)
                    run -= 16
                    for b in br:
                        w.write(b, 1)
                    br = []
                if t > 1:  # already nonzero: one correction bit
                    br.append(t & 1)
                    continue
                code, length = _ENC_AC[(run << 4) | 1]
                w.write(code, length)
                w.write(1 if band[i] > 0 else 0, 1)
                for b in br:
                    w.write(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                code, length = _ENC_AC[0x00]
                w.write(code, length)
                for b in br:
                    w.write(b, 1)


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0,
                gray: bool = False, progressive: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, or 4:2:0 with
    ``subsample=True``).  ``restart_interval`` emits a DRI segment and
    RSTn markers every that-many MCUs (the error-resilience feature real
    encoders use); ``gray=True`` writes a 1-component luminance-only
    stream.  ``progressive=True`` writes an SOF2 stream (interleaved DC
    scan + per-component spectral bands, each successively approximated
    Al=1 -> 0); it carries the SAME quantized coefficients as the baseline
    stream, so both decode to identical pixels.  ``restart_interval`` is
    ignored in progressive mode."""
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
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)  # SOF0/SOF2
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
    if restart_interval and not progressive:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI

    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcols = (w + mcu_w - 1) // mcu_w
    mrows = (h + mcu_h - 1) // mcu_h
    yp = _pad_to_blocks(y, mrows * mcu_h, mcols * mcu_w)
    ch, cw = mrows * 8, mcols * 8
    cbp = _pad_to_blocks(cb, ch, cw)
    crp = _pad_to_blocks(cr, ch, cw)

    if progressive:
        zz_all = [_plane_zz(yp, ql)]
        hv = [(hs, vs)]
        tds = [(1, 0, 0)]  # (component id, DC table, AC table)
        dims = [(h, w)]
        if not gray:
            zz_all += [_plane_zz(cbp, qc), _plane_zz(crp, qc)]
            hv += [(1, 1), (1, 1)]
            tds += [(2, 1, 1), (3, 1, 1)]
            dims += [((h + vs - 1) // vs, (w + hs - 1) // hs)] * 2
        bands = ((1, 5), (6, 63))
        # DC first (interleaved) at Al=1
        out += _sos_header(tds, 0, 0, 0, 1)
        bw = _BitWriter()
        _write_prog_dc_first(bw, zz_all, hv, 1)
        bw.flush()
        out += bw.out
        # AC first scans per band x component at Al=1
        for lo, hi_ in bands:
            for ci in range(len(zz_all)):
                nbr = (dims[ci][0] + 7) // 8
                nbc = (dims[ci][1] + 7) // 8
                out += _sos_header([tds[ci]], lo, hi_, 0, 1)
                bw = _BitWriter()
                _write_prog_ac_first(bw, zz_all[ci], nbr, nbc, lo, hi_, 1)
                bw.flush()
                out += bw.out
        # DC refinement to Al=0 (one raw bit per block)
        out += _sos_header(tds, 0, 0, 1, 0)
        bw = _BitWriter()
        _write_prog_dc_refine(bw, zz_all, hv, 0)
        bw.flush()
        out += bw.out
        # AC refinement scans to Al=0
        for lo, hi_ in bands:
            for ci in range(len(zz_all)):
                nbr = (dims[ci][0] + 7) // 8
                nbc = (dims[ci][1] + 7) // 8
                out += _sos_header([tds[ci]], lo, hi_, 1, 0)
                bw = _BitWriter()
                _write_prog_ac_refine(bw, zz_all[ci], nbr, nbc, lo, hi_, 0)
                bw.flush()
                out += bw.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp) \
        + (bytes([1, 0x00]) if gray
           else bytes([1, 0x00, 2, 0x11, 3, 0x11])) \
        + bytes([0, 63, 0])  # SOS

    bw = _BitWriter()
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
    prog_state = None
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps,
                     "prog": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} "
                             "(baseline sequential / progressive only)")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = {}
            order = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cid] = (tt >> 4, tt & 0xF)
                order.append(cid)
            if frame is None:
                raise ValueError("SOS before SOF")
            if not frame["prog"]:
                return _decode_scan(payload, pos, frame, scan, qtables,
                                    htables, restart)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if prog_state is None:
                prog_state = _init_prog_state(frame)
            pos = _decode_prog_scan(payload, pos, frame, order, scan,
                                    ss, se, ahal >> 4, ahal & 0xF,
                                    htables, prog_state, restart)
    if frame is not None and frame.get("prog") and prog_state is not None:
        return _finish_prog(frame, prog_state, qtables)
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
    return _planes_to_rgb(planes, comps, fh, fw, hmax, vmax)


# ---------------------------------------------------------------------------
# Progressive decoding (SOF2, T.81 Annex G): each scan deposits one piece of
# the coefficient picture — a spectral band at a given bit precision — and
# reconstruction (dequant + IDCT) happens once, after the last scan.
# ---------------------------------------------------------------------------

def _init_prog_state(frame) -> dict:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcols = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mrows = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    # per component: MCU-padded block grid of zigzag-order coefficients
    # (interleaved DC scans cover the padding blocks; non-interleaved AC
    # scans cover only the component's own ceil(dim/8) grid)
    coefs = {c["id"]: np.zeros((mrows * c["v"], mcols * c["h"], 64),
                               dtype=np.int64) for c in comps}
    return {"coefs": coefs, "hmax": hmax, "vmax": vmax,
            "mrows": mrows, "mcols": mcols}


def _comp_blocks(frame, c, state) -> tuple[int, int]:
    """Non-interleaved block-grid dims: ceil(comp_dim/8) of the
    component's actual (sampling-scaled) size — NOT the MCU-padded grid."""
    ch = -(-frame["h"] * c["v"] // state["vmax"])
    cw = -(-frame["w"] * c["h"] // state["hmax"])
    return (ch + 7) // 8, (cw + 7) // 8


def _skip_to_restart(r: _BitReader, payload: bytes) -> None:
    r.align()
    while r.pos + 1 < len(payload) and not (
            payload[r.pos] == 0xFF
            and 0xD0 <= payload[r.pos + 1] <= 0xD7):
        r.pos += 1
    if r.pos + 1 >= len(payload):
        raise ValueError("missing restart marker")
    r.pos += 2


def _ac_first_block(r, actab, blk, ss, se, al, eobrun) -> int:
    """One block of an AC 'first' scan (Ah=0): EOB runs, ZRL, coefficients
    scaled by 2^Al (T.81 G.2 / F.2.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff_symbol(r, actab)
        rr, s = rs >> 4, rs & 0xF
        if s == 0:
            if rr == 15:  # ZRL
                k += 16
                continue
            # EOBn: run of (1 << rr) + ext blocks INCLUDING this one
            return (1 << rr) - 1 + (r.read_bits(rr) if rr else 0)
        k += rr
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        blk[k] = _receive_extend(r, s) << al
        k += 1
    return 0


def _ac_refine_block(r, actab, blk, ss, se, al, eobrun) -> int:
    """One block of an AC refinement scan (Ah>0): newly significant
    coefficients arrive as ±2^Al; every nonzero-history coefficient passed
    over consumes one correction bit (T.81 G.2 successive approximation)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff_symbol(r, actab)
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr < 15:
                    eobrun = (1 << rr) + (r.read_bits(rr) if rr else 0)
                    break
                newval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude category")
                newval = p1 if r.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if r.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if r.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(payload, pos, frame, order, scan, ss, se, ah, al,
                      htables, state, restart) -> int:
    """Decode one progressive scan's entropy data into the coefficient
    state; return the offset of the next marker."""
    comps = {c["id"]: c for c in frame["comps"]}
    coefs = state["coefs"]
    r = _BitReader(payload, pos)
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if len(order) > 1:  # interleaved: MCU order over the padded grid
            units = []
            for my in range(state["mrows"]):
                for mx in range(state["mcols"]):
                    mcu = []
                    for cid in order:
                        c = comps[cid]
                        mcu += [(cid, my * c["v"] + by, mx * c["h"] + bx)
                                for by in range(c["v"])
                                for bx in range(c["h"])]
                    units.append(mcu)
        else:
            cid = order[0]
            nbr, nbc = _comp_blocks(frame, comps[cid], state)
            units = [[(cid, by, bx)] for by in range(nbr)
                     for bx in range(nbc)]
        preds = dict.fromkeys(order, 0)
        for ui, unit in enumerate(units):
            if restart and ui and ui % restart == 0:
                _skip_to_restart(r, payload)
                preds = dict.fromkeys(order, 0)
            for cid, by, bx in unit:
                blk = coefs[cid][by, bx]
                if ah == 0:
                    s = _decode_huff_symbol(r, htables[(0, scan[cid][0])])
                    preds[cid] += _receive_extend(r, s)
                    blk[0] = preds[cid] << al
                else:  # refinement: one bit per block
                    blk[0] |= r.read_bit() << al
    else:  # AC scan: T.81 mandates single-component, non-interleaved
        if len(order) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cid = order[0]
        actab = htables[(1, scan[cid][1])]
        nbr, nbc = _comp_blocks(frame, comps[cid], state)
        arr = coefs[cid]
        eobrun = 0
        bi = 0
        for by in range(nbr):
            for bx in range(nbc):
                if restart and bi and bi % restart == 0:
                    _skip_to_restart(r, payload)
                    eobrun = 0
                bi += 1
                if ah == 0:
                    eobrun = _ac_first_block(r, actab, arr[by, bx],
                                             ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(r, actab, arr[by, bx],
                                              ss, se, al, eobrun)
    # entropy data ends here; skip pad bytes to the next true marker
    pos = r.pos
    while pos + 1 < len(payload):
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00 \
                and not (0xD0 <= payload[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return pos


def _finish_prog(frame, state, qtables) -> np.ndarray:
    """Dequantize + batch-IDCT the accumulated coefficients."""
    comps = frame["comps"]
    planes = []
    for c in comps:
        zz = state["coefs"][c["id"]]
        bv, bh_ = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz
        x = nat.reshape(-1, 8, 8) * qtables[c["tq"]].astype(np.float64)
        blocks = np.einsum("ij,njk,kl->nil", _A.T, x, _A) + 128.0
        planes.append(blocks.reshape(bv, bh_, 8, 8).transpose(0, 2, 1, 3)
                      .reshape(bv * 8, bh_ * 8))
    return _planes_to_rgb(planes, comps, frame["h"], frame["w"],
                          state["hmax"], state["vmax"])


def _planes_to_rgb(planes, comps, fh, fw, hmax, vmax) -> np.ndarray:
    """Upsample every component to full frame resolution (nearest) and
    convert to RGB (grayscale replicated)."""
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
