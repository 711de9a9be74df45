"""H.264 CAVLC residual coding + 4x4 transform/quantization (spec 9.2, 8.5).

This module closes the codec seam VERDICT r04 #2 left documented: the
coefficient-level CAVLC layer (coeff_token Table 9-5, level prefix/suffix
9.2.2, total_zeros Tables 9-7/9-8/9-9(a), run_before Table 9-10), the
zig-zag scans, the dequantization of 8.5.10-8.5.12 (flat scaling lists),
and the integer inverse transforms (4x4 core, 4x4 luma-DC Hadamard, 2x2
chroma-DC Hadamard).  With it, sparksketch.h264 encodes and decodes
Intra_16x16 macroblocks WITH coded residuals — cbp_luma 15 and
cbp_chroma 1/2 — instead of falling back to I_PCM whenever prediction
alone misses ``pcm_mad``.

Everything here is the published ITU-T H.264 / ISO 14496-10 spec
implemented from scratch in NumPy/Python (table numbers cited inline);
the reference repo (Claudenw/BloomFilters) has no media scope — this
belongs to the repo's LLM-pipeline multimodal tier (like jpeg.py /
png.py).

Dequantization exactness note: with the default flat scaling lists
(weightScale == 16 everywhere), the spec's two-branch formulas 8.5.10-12
collapse EXACTLY (not approximately) to the single-shift forms used
below — e.g. 8.5.12.1's qP < 24 branch ``(c*16*v + 2^(3-qP/6)) >>
(4-qP/6)`` equals ``c*v << (qP/6)`` because 16 = 2^4 makes the dividend
a multiple of the divisor and the rounding addend is exactly half of it
(floor doesn't move).  tests/test_h264.py checks the branch equality
explicitly.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# scans (Table 8-13 zig-zag; Figure 6-10 4x4 block order inside an MB)
# ---------------------------------------------------------------------------

# zig-zag scan for frame-coded 4x4 blocks: scan index -> (row, col)
ZIGZAG_4x4 = ((0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
              (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3))
_ZR = np.array([p[0] for p in ZIGZAG_4x4])
_ZC = np.array([p[1] for p in ZIGZAG_4x4])

# luma 4x4 block coding order within an MB: block index -> (x, y) in 4x4
# units (the 8x8-then-4x4 Z order of Figure 6-10)
LUMA_BLOCK_ORDER = ((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1),
                    (3, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2),
                    (2, 3), (3, 3))
# chroma 4x4 blocks of the 8x8 plane: raster
CHROMA_BLOCK_ORDER = ((0, 0), (1, 0), (0, 1), (1, 1))


def scan_to_mat(coeffs_scan: np.ndarray, offset: int = 0) -> np.ndarray:
    """Scan-order coefficient vector -> (4,4) int64 matrix.  ``offset`` is
    the zig-zag position of scan index 0 (1 for AC-only blocks whose DC
    travels in a separate DC block)."""
    m = np.zeros((4, 4), dtype=np.int64)
    n = len(coeffs_scan)
    m[_ZR[offset:offset + n], _ZC[offset:offset + n]] = coeffs_scan
    return m


def mat_to_scan(m: np.ndarray, offset: int = 0) -> np.ndarray:
    """(4,4) matrix -> scan-order vector of length 16-offset."""
    return np.asarray(m, dtype=np.int64)[_ZR[offset:], _ZC[offset:]]


# ---------------------------------------------------------------------------
# coeff_token (Table 9-5).  JM-style (length, code) arrays indexed
# [TrailingOnes][TotalCoeff]; length 0 = impossible combination.  Columns:
# 0 <= nC < 2, 2 <= nC < 4, 4 <= nC < 8; nC >= 8 is a 6-bit FLC handled in
# code; nC == -1 is the 4:2:0 chroma-DC column.
# ---------------------------------------------------------------------------

_CT_LEN = (
    (  # 0 <= nC < 2
        (1, 6, 8, 9, 10, 11, 13, 13, 13, 14, 14, 15, 15, 16, 16, 16, 16),
        (0, 2, 6, 8, 9, 10, 11, 13, 13, 14, 14, 15, 15, 15, 16, 16, 16),
        (0, 0, 3, 7, 8, 9, 10, 11, 13, 13, 14, 14, 15, 15, 16, 16, 16),
        (0, 0, 0, 5, 6, 7, 8, 9, 10, 11, 13, 14, 14, 15, 15, 16, 16),
    ),
    (  # 2 <= nC < 4
        (2, 6, 6, 7, 8, 8, 9, 11, 11, 12, 12, 12, 13, 13, 13, 14, 14),
        (0, 2, 5, 6, 6, 7, 8, 9, 11, 11, 12, 12, 13, 13, 14, 14, 14),
        (0, 0, 3, 6, 6, 7, 8, 9, 11, 11, 12, 12, 13, 13, 13, 14, 14),
        (0, 0, 0, 4, 4, 5, 6, 6, 7, 9, 11, 11, 12, 13, 13, 13, 14),
    ),
    (  # 4 <= nC < 8
        (4, 6, 6, 6, 7, 7, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 10),
        (0, 4, 5, 5, 5, 5, 6, 6, 7, 8, 8, 9, 9, 9, 10, 10, 10),
        (0, 0, 4, 5, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 10),
        (0, 0, 0, 4, 4, 4, 4, 4, 5, 6, 7, 8, 8, 9, 10, 10, 10),
    ),
)
_CT_COD = (
    (
        (1, 5, 7, 7, 7, 7, 15, 11, 8, 15, 11, 15, 11, 15, 11, 7, 4),
        (0, 1, 4, 6, 6, 6, 6, 14, 10, 14, 10, 14, 10, 1, 14, 10, 6),
        (0, 0, 1, 5, 5, 5, 5, 5, 13, 9, 13, 9, 13, 9, 13, 9, 5),
        (0, 0, 0, 3, 3, 4, 4, 4, 4, 4, 12, 12, 8, 12, 8, 12, 8),
    ),
    (
        (3, 11, 7, 7, 7, 4, 7, 15, 11, 15, 11, 8, 15, 11, 7, 9, 7),
        (0, 2, 7, 10, 6, 6, 6, 6, 14, 10, 14, 10, 14, 10, 11, 8, 6),
        (0, 0, 3, 9, 5, 5, 5, 5, 13, 9, 13, 9, 13, 9, 6, 10, 5),
        (0, 0, 0, 5, 4, 6, 8, 4, 4, 4, 12, 8, 12, 8, 12, 1, 4),
    ),
    (
        (15, 15, 11, 8, 15, 11, 9, 8, 15, 11, 15, 11, 8, 13, 9, 5, 1),
        (0, 14, 15, 12, 10, 8, 14, 10, 14, 14, 10, 14, 10, 7, 12, 8, 4),
        (0, 0, 13, 14, 11, 9, 13, 9, 13, 10, 13, 9, 13, 9, 11, 7, 3),
        (0, 0, 0, 12, 11, 10, 9, 8, 13, 12, 12, 12, 8, 12, 10, 6, 2),
    ),
)
# chroma DC 4:2:0 column (TotalCoeff <= 4)
_CT_CDC_LEN = ((2, 6, 6, 6, 6), (0, 1, 6, 7, 8), (0, 0, 3, 7, 8),
               (0, 0, 0, 6, 7))
_CT_CDC_COD = ((1, 7, 4, 3, 2), (0, 1, 6, 3, 3), (0, 0, 1, 2, 2),
               (0, 0, 0, 5, 0))


def _build_decode(len_tab, cod_tab, max_tc):
    d = {}
    for t1 in range(4):
        for tc in range(max_tc + 1):
            ln = len_tab[t1][tc] if t1 < len(len_tab) else 0
            if ln:
                key = (ln, cod_tab[t1][tc])
                assert key not in d, f"coeff_token collision {key}"
                d[key] = (t1, tc)
    return d


_CT_DEC = tuple(_build_decode(_CT_LEN[i], _CT_COD[i], 16) for i in range(3))
_CT_CDC_DEC = _build_decode(_CT_CDC_LEN, _CT_CDC_COD, 4)


def _col(nc: int) -> int:
    if nc < 2:
        return 0
    if nc < 4:
        return 1
    return 2


def write_coeff_token(w, nc: int, t1: int, tc: int) -> None:
    if nc == -1:
        ln, code = _CT_CDC_LEN[t1][tc], _CT_CDC_COD[t1][tc]
    elif nc >= 8:
        w.u(3 if tc == 0 else 4 * (tc - 1) + t1, 6)
        return
    else:
        c = _col(nc)
        ln, code = _CT_LEN[c][t1][tc], _CT_COD[c][t1][tc]
    if ln == 0:
        raise ValueError(f"impossible coeff_token (T1={t1}, TC={tc})")
    w.u(code, ln)


def read_coeff_token(r, nc: int) -> tuple[int, int]:
    """-> (TrailingOnes, TotalCoeff)."""
    if nc >= 8:  # 6-bit FLC
        v = r.u(6)
        if v == 3:
            return 0, 0
        tc, t1 = v // 4 + 1, v % 4
        if t1 > min(3, tc):
            raise ValueError(f"invalid coeff_token FLC value {v}")
        return t1, tc
    table = _CT_CDC_DEC if nc == -1 else _CT_DEC[_col(nc)]
    ln, code = 0, 0
    while ln < 16:
        code = (code << 1) | r.u(1)
        ln += 1
        hit = table.get((ln, code))
        if hit is not None:
            return hit
    raise ValueError("invalid coeff_token bit pattern")


# ---------------------------------------------------------------------------
# levels (spec 9.2.2.1) — prefix/suffix with adaptive suffixLength
# ---------------------------------------------------------------------------

def _read_level_prefix(r) -> int:
    n = 0
    while r.u(1) == 0:
        n += 1
        if n > 47:
            raise ValueError("level_prefix run too long (corrupt stream)")
    return n


def read_levels(r, t1: int, tc: int) -> list[int]:
    """Decode the tc level values in decode order (highest frequency
    first); the first t1 are trailing +-1s."""
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if tc > 10 and t1 < 3 else 0
    for i in range(tc - t1):
        prefix = _read_level_prefix(r)
        code = min(15, prefix) << suffix_len
        if suffix_len > 0 or prefix >= 14:
            size = suffix_len
            if prefix == 14 and suffix_len == 0:
                size = 4
            elif prefix >= 15:
                size = prefix - 3
            if size:
                code += r.u(size)
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == 0 and t1 < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    return levels


def _write_level_code(w, code: int, suffix_len: int) -> None:
    """Inverse of the 9.2.2.1 prefix/suffix read for one (already
    offset-adjusted) levelCode."""
    if suffix_len == 0:
        if code < 14:
            w.u(1, code + 1)            # `code` zeros then a 1
            return
        if code < 30:                   # prefix 14, 4-bit suffix
            w.u(1, 15)
            w.u(code - 14, 4)
            return
        d = code - 30                   # prefix >= 15 escape (+15 applied)
    else:
        if (code >> suffix_len) < 15:
            w.u(1, (code >> suffix_len) + 1)
            if suffix_len:
                w.u(code & ((1 << suffix_len) - 1), suffix_len)
            return
        d = code - (15 << suffix_len)
    if d < 4096:                        # prefix 15, 12-bit suffix
        w.u(1, 16)
        w.u(d, 12)
        return
    p = 16                              # prefix >= 16: offset 2^(p-3)-4096
    while d >= (1 << (p - 2)) - 4096:
        p += 1
    w.u(1, p + 1)
    w.u(d - ((1 << (p - 3)) - 4096), p - 3)


def write_levels(w, levels: list[int], t1: int, tc: int) -> None:
    for lv in levels[:t1]:
        w.u(1 if lv < 0 else 0, 1)
    suffix_len = 1 if tc > 10 and t1 < 3 else 0
    for i, lv in enumerate(levels[t1:]):
        code = 2 * lv - 2 if lv > 0 else -2 * lv - 1
        if i == 0 and t1 < 3:
            code -= 2
        _write_level_code(w, code, suffix_len)
        if suffix_len == 0:
            suffix_len = 1
        if abs(lv) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1


# ---------------------------------------------------------------------------
# total_zeros (Tables 9-7 / 9-8; 9-9(a) for 4:2:0 chroma DC), run_before
# (Table 9-10) — JM-style (length, code) rows indexed [TotalCoeff-1][value]
# ---------------------------------------------------------------------------

_TZ_LEN = (
    (1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9),
    (3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6),
    (4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6),
    (5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5),
    (4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5),
    (6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6),
    (6, 5, 3, 3, 3, 2, 3, 4, 3, 6),
    (6, 4, 5, 3, 2, 2, 3, 3, 6),
    (6, 6, 4, 2, 2, 3, 2, 5),
    (5, 5, 3, 2, 2, 2, 4),
    (4, 4, 3, 3, 1, 3),
    (4, 4, 2, 1, 3),
    (3, 3, 1, 2),
    (2, 2, 1),
    (1, 1),
)
_TZ_COD = (
    (1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1),
    (7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0),
    (5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0),
    (3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0),
    (5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0),
    (1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0),
    (1, 1, 5, 4, 3, 3, 2, 1, 1, 0),
    (1, 1, 1, 3, 3, 2, 2, 1, 0),
    (1, 0, 1, 3, 2, 1, 1, 1),
    (1, 0, 1, 3, 2, 1, 1),
    (0, 1, 1, 2, 1, 3),
    (0, 1, 1, 1, 1),
    (0, 1, 1, 1),
    (0, 1, 1),
    (0, 1),
)
_TZ_CDC_LEN = ((1, 2, 3, 3), (1, 2, 2), (1, 1))
_TZ_CDC_COD = ((1, 1, 1, 0), (1, 1, 0), (1, 0))


def _tz_tables(tc: int, max_coeff: int):
    if max_coeff == 4:  # chroma DC (4:2:0)
        return _TZ_CDC_LEN[tc - 1], _TZ_CDC_COD[tc - 1]
    return _TZ_LEN[tc - 1], _TZ_COD[tc - 1]


def write_total_zeros(w, tz: int, tc: int, max_coeff: int) -> None:
    lens, cods = _tz_tables(tc, max_coeff)
    w.u(cods[tz], lens[tz])


def read_total_zeros(r, tc: int, max_coeff: int) -> int:
    lens, cods = _tz_tables(tc, max_coeff)
    hi = max_coeff - tc  # largest possible value
    ln, code = 0, 0
    while ln < 9:
        code = (code << 1) | r.u(1)
        ln += 1
        for v in range(hi + 1):
            if lens[v] == ln and cods[v] == code:
                return v
    raise ValueError("invalid total_zeros bit pattern")


_RUN_LEN = ((1, 1), (1, 2, 2), (2, 2, 2, 2), (2, 2, 2, 3, 3),
            (2, 2, 3, 3, 3, 3), (2, 3, 3, 3, 3, 3, 3))
_RUN_COD = ((1, 0), (1, 1, 0), (3, 2, 1, 0), (3, 2, 1, 1, 0),
            (3, 2, 3, 2, 1, 0), (3, 0, 1, 3, 2, 5, 4))


def write_run_before(w, run: int, zeros_left: int) -> None:
    if zeros_left <= 6:
        t = zeros_left - 1
        w.u(_RUN_COD[t][run], _RUN_LEN[t][run])
    elif run < 7:
        w.u(7 - run, 3)
    else:  # run 7..14: (run-4) zeros then a 1
        w.u(1, run - 3)


def read_run_before(r, zeros_left: int) -> int:
    if zeros_left <= 6:
        lens, cods = _RUN_LEN[zeros_left - 1], _RUN_COD[zeros_left - 1]
        ln, code = 0, 0
        while ln < 3:
            code = (code << 1) | r.u(1)
            ln += 1
            for v in range(len(lens)):
                if lens[v] == ln and cods[v] == code:
                    return v
        raise ValueError("invalid run_before bit pattern")
    v = r.u(3)
    if v:
        return 7 - v
    run = 7  # zeros already consumed: 3 of them; keep reading
    while r.u(1) == 0:
        run += 1
        if run > 14:
            raise ValueError("run_before run too long")
    return run


# ---------------------------------------------------------------------------
# residual_block (spec 7.3.5.3.2 semantics, CAVLC)
# ---------------------------------------------------------------------------

def read_residual_block(r, nc: int, max_coeff: int) \
        -> tuple[np.ndarray, int]:
    """-> (coefficients in scan order [max_coeff], TotalCoeff)."""
    t1, tc = read_coeff_token(r, nc)
    out = np.zeros(max_coeff, dtype=np.int64)
    if tc == 0:
        return out, 0
    if tc > max_coeff:
        raise ValueError(f"TotalCoeff {tc} > maxNumCoeff {max_coeff}")
    levels = read_levels(r, t1, tc)
    tz = read_total_zeros(r, tc, max_coeff) if tc < max_coeff else 0
    zeros_left = tz
    runs = []
    for _ in range(tc - 1):
        run = read_run_before(r, zeros_left) if zeros_left > 0 else 0
        runs.append(run)
        zeros_left -= run
        if zeros_left < 0:
            raise ValueError("run_before exceeds total_zeros")
    runs.append(zeros_left)
    pos = -1
    for i in range(tc - 1, -1, -1):  # place lowest-frequency first
        pos += runs[i] + 1
        out[pos] = levels[i]
    return out, tc


def write_residual_block(w, coeffs_scan: np.ndarray, nc: int) -> int:
    """Encode one block's scan-order coefficients; -> TotalCoeff (the
    value the caller must store into the nC context grid)."""
    coeffs = np.asarray(coeffs_scan, dtype=np.int64)
    max_coeff = len(coeffs)
    nz = np.flatnonzero(coeffs)
    tc = len(nz)
    if tc == 0:
        write_coeff_token(w, nc, 0, 0)
        return 0
    t1 = 0
    for p in nz[::-1]:
        if abs(int(coeffs[p])) != 1 or t1 == 3:
            break
        t1 += 1
    levels = [int(coeffs[p]) for p in nz[::-1]]  # highest frequency first
    write_coeff_token(w, nc, t1, tc)
    write_levels(w, levels, t1, tc)
    tz = int(nz[-1]) + 1 - tc
    if tc < max_coeff:
        write_total_zeros(w, tz, tc, max_coeff)
    zeros_left = tz
    for i in range(tc - 1):  # decode-order runs: between high nonzeros
        if zeros_left <= 0:
            break
        run = int(nz[tc - 1 - i]) - int(nz[tc - 2 - i]) - 1
        write_run_before(w, run, zeros_left)
        zeros_left -= run
    return tc


# ---------------------------------------------------------------------------
# nC context (spec 9.2.1) over absolute 4x4-block total_coeff grids
# ---------------------------------------------------------------------------

def nc_from_grid(grid: np.ndarray, bx: int, by: int) -> int:
    """nC for the block at absolute 4x4 coords (bx, by).  ``grid`` holds
    per-4x4 TotalCoeff with 16 at I_PCM positions; availability = picture
    edge (single-slice frames)."""
    a, b = bx > 0, by > 0
    na = int(grid[by, bx - 1]) if a else 0
    nb = int(grid[by - 1, bx]) if b else 0
    if a and b:
        return (na + nb + 1) >> 1
    if a:
        return na
    if b:
        return nb
    return 0


# ---------------------------------------------------------------------------
# transforms + (de)quantization (spec 8.5; JM-equivalent exact forms for
# flat scaling lists — see module docstring)
# ---------------------------------------------------------------------------

# quantization MF / dequantization V tables, rows qp%6, cols position
# class: 0 = corners {(0,0),(0,2),(2,0),(2,2)}, 1 = {(1,1),(1,3),(3,1),
# (3,3)}, 2 = the rest
_MF = ((13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
       (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559))
_V = ((10, 16, 13), (11, 18, 14), (13, 20, 16), (14, 23, 18), (16, 25, 20),
      (18, 29, 23))
_POS_CLS = np.array([[0, 2, 0, 2], [2, 1, 2, 1], [0, 2, 0, 2],
                     [2, 1, 2, 1]])

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1],
                [1, -2, 2, -1]], dtype=np.int64)
_CI = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1],
                [1, -1, 1, -1]], dtype=np.int64)  # Hadamard (DC transform)
_H2 = np.array([[1, 1], [1, -1]], dtype=np.int64)

# chroma QP mapping (Table 8-15) for qPi 30..51; below 30 QPc == qPi
_QPC_HI = (29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38,
           38, 38, 39, 39, 39, 39)


def chroma_qp(qp_y: int, offset: int) -> int:
    qpi = min(51, max(0, qp_y + offset))
    return qpi if qpi < 30 else _QPC_HI[qpi - 30]


def fwd4x4(x: np.ndarray) -> np.ndarray:
    """Forward 4x4 integer core transform (encoder side)."""
    return _CF @ np.asarray(x, dtype=np.int64) @ _CF.T


def inv4x4(d: np.ndarray) -> np.ndarray:
    """Inverse 4x4 core transform (spec 8.5.12.2) incl. the final
    (x + 32) >> 6 rounding; input is the dequantized coefficient matrix,
    output the residual to add to prediction."""
    d = np.asarray(d, dtype=np.int64)
    e = np.empty_like(d)
    e[0] = d[0] + d[2]
    e[1] = d[0] - d[2]
    e[2] = (d[1] >> 1) - d[3]
    e[3] = d[1] + (d[3] >> 1)
    f = np.empty_like(d)
    f[0] = e[0] + e[3]
    f[1] = e[1] + e[2]
    f[2] = e[1] - e[2]
    f[3] = e[0] - e[3]
    g = np.empty_like(d)
    g[:, 0] = f[:, 0] + f[:, 2]
    g[:, 1] = f[:, 0] - f[:, 2]
    g[:, 2] = (f[:, 1] >> 1) - f[:, 3]
    g[:, 3] = f[:, 1] + (f[:, 3] >> 1)
    h = np.empty_like(d)
    h[:, 0] = g[:, 0] + g[:, 3]
    h[:, 1] = g[:, 1] + g[:, 2]
    h[:, 2] = g[:, 1] - g[:, 2]
    h[:, 3] = g[:, 0] - g[:, 3]
    return (h + 32) >> 6


def quant4x4(w: np.ndarray, qp: int) -> np.ndarray:
    """Intra quantization of a 4x4 core-transform output (encoder)."""
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    mf = np.array(_MF[qp % 6], dtype=np.int64)[_POS_CLS]
    w = np.asarray(w, dtype=np.int64)
    return np.sign(w) * ((np.abs(w) * mf + f) >> qbits)


def dequant4x4_ac(c: np.ndarray, qp: int) -> np.ndarray:
    """Dequantize a 4x4 block's levels (spec 8.5.12.1, flat lists; exact
    single-shift form — see module docstring)."""
    v = np.array(_V[qp % 6], dtype=np.int64)[_POS_CLS]
    return (np.asarray(c, dtype=np.int64) * v) << (qp // 6)


def quant_dc_luma(wd: np.ndarray, qp: int) -> np.ndarray:
    """Quantize the Hadamard-transformed 4x4 luma DC matrix (encoder).

    The extra >>2 vs the AC path compensates the norm of the luma DC
    chain: the 4x4 Hadamard applied on both sides contributes 16 where
    the decoder's 8.5.10 scaling assumes the chain of a half-normalized
    forward transform — without it every reconstructed DC comes back
    exactly 2x (verified against the decoder chain in
    tests/test_h264_residual.py::test_flat_dc_roundtrip_all_qp)."""
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    mf = _MF[qp % 6][0]
    wd = np.asarray(wd, dtype=np.int64)
    return np.sign(wd) * ((np.abs(wd) * mf + 4 * f) >> (qbits + 2))


def dequant_dc_luma(c: np.ndarray, qp: int) -> np.ndarray:
    """Inverse Hadamard + scaling of the Intra16x16 luma DC block
    (spec 8.5.10, flat lists)."""
    fD = _CI @ np.asarray(c, dtype=np.int64) @ _CI
    v = _V[qp % 6][0]
    if qp >= 12:
        return (fD * v) << (qp // 6 - 2)
    return (fD * v + (1 << (1 - qp // 6))) >> (2 - qp // 6)


def quant_dc_chroma(wd: np.ndarray, qp: int) -> np.ndarray:
    """Quantize the 2x2 Hadamard-transformed chroma DC matrix."""
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    mf = _MF[qp % 6][0]
    wd = np.asarray(wd, dtype=np.int64)
    return np.sign(wd) * ((np.abs(wd) * mf + 2 * f) >> (qbits + 1))


def dequant_dc_chroma(c: np.ndarray, qp: int) -> np.ndarray:
    """Inverse 2x2 Hadamard + scaling (spec 8.5.11, 4:2:0, flat lists:
    LevelScale = 16*v so the >> 5 keeps one factor-of-2 headroom)."""
    fD = _H2 @ np.asarray(c, dtype=np.int64) @ _H2
    return ((fD * 16 * _V[qp % 6][0]) << (qp // 6)) >> 5


def hadamard4(x: np.ndarray) -> np.ndarray:
    """Forward 4x4 Hadamard for the luma DC path (encoder)."""
    return _CI @ np.asarray(x, dtype=np.int64) @ _CI


def hadamard2(x: np.ndarray) -> np.ndarray:
    """Forward 2x2 Hadamard for the chroma DC path (encoder)."""
    return _H2 @ np.asarray(x, dtype=np.int64) @ _H2


# ---------------------------------------------------------------------------
# shared reconstruction — the encoder reconstructs through EXACTLY these
# functions, so decoder output is bit-identical to the encoder's own
# reconstruction (the repo's standing codec contract)
# ---------------------------------------------------------------------------

def recon_luma16(pred: np.ndarray, dc_levels: np.ndarray,
                 ac_blocks: list[np.ndarray] | None, qp: int) -> np.ndarray:
    """Reconstruct one Intra_16x16 luma MB.  ``dc_levels`` is the (4,4)
    DC level matrix (CAVLC order already undone); ``ac_blocks`` is the
    16-entry list of 15-coefficient scan-order AC vectors in
    LUMA_BLOCK_ORDER, or None when cbp_luma == 0."""
    dc = dequant_dc_luma(dc_levels, qp)
    out = np.empty((16, 16), dtype=np.uint8)
    pred = np.asarray(pred, dtype=np.int64)
    for blk, (ox, oy) in enumerate(LUMA_BLOCK_ORDER):
        d = scan_to_mat(ac_blocks[blk], offset=1) if ac_blocks is not None \
            else np.zeros((4, 4), dtype=np.int64)
        d = dequant4x4_ac(d, qp)
        d[0, 0] = dc[oy, ox]
        res = inv4x4(d)
        x, y = ox * 4, oy * 4
        out[y:y + 4, x:x + 4] = np.clip(
            pred[y:y + 4, x:x + 4] + res, 0, 255).astype(np.uint8)
    return out


def recon_chroma8(pred: np.ndarray, dc_levels: np.ndarray,
                  ac_blocks: list[np.ndarray] | None, qpc: int) \
        -> np.ndarray:
    """Reconstruct one 8x8 chroma plane.  ``dc_levels`` is the (2,2) DC
    level matrix; ``ac_blocks`` the 4-entry 15-coefficient list in
    CHROMA_BLOCK_ORDER or None when cbp_chroma < 2."""
    dc = dequant_dc_chroma(dc_levels, qpc)
    out = np.empty((8, 8), dtype=np.uint8)
    pred = np.asarray(pred, dtype=np.int64)
    for blk, (ox, oy) in enumerate(CHROMA_BLOCK_ORDER):
        d = scan_to_mat(ac_blocks[blk], offset=1) if ac_blocks is not None \
            else np.zeros((4, 4), dtype=np.int64)
        d = dequant4x4_ac(d, qpc)
        d[0, 0] = dc[oy, ox]
        res = inv4x4(d)
        x, y = ox * 4, oy * 4
        out[y:y + 4, x:x + 4] = np.clip(
            pred[y:y + 4, x:x + 4] + res, 0, 255).astype(np.uint8)
    return out


def transform_quant_luma16(src: np.ndarray, pred: np.ndarray, qp: int) \
        -> tuple[np.ndarray, list[np.ndarray]]:
    """Encoder forward path for one luma MB: -> (dc_levels (4,4),
    ac_blocks 16x[15]) quantized levels."""
    res = np.asarray(src, dtype=np.int64) - np.asarray(pred, dtype=np.int64)
    dc_w = np.zeros((4, 4), dtype=np.int64)
    ac_blocks: list[np.ndarray] = [None] * 16  # type: ignore[list-item]
    for blk, (ox, oy) in enumerate(LUMA_BLOCK_ORDER):
        w = fwd4x4(res[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4])
        dc_w[oy, ox] = w[0, 0]
        q = quant4x4(w, qp)
        ac_blocks[blk] = mat_to_scan(q, offset=1)
    dc_levels = quant_dc_luma(hadamard4(dc_w), qp)
    return dc_levels, ac_blocks


def transform_quant_chroma8(src: np.ndarray, pred: np.ndarray, qpc: int) \
        -> tuple[np.ndarray, list[np.ndarray]]:
    """Encoder forward path for one 8x8 chroma plane: -> (dc_levels
    (2,2), ac_blocks 4x[15])."""
    res = np.asarray(src, dtype=np.int64) - np.asarray(pred, dtype=np.int64)
    dc_w = np.zeros((2, 2), dtype=np.int64)
    ac_blocks: list[np.ndarray] = [None] * 4  # type: ignore[list-item]
    for blk, (ox, oy) in enumerate(CHROMA_BLOCK_ORDER):
        w = fwd4x4(res[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4])
        dc_w[oy, ox] = w[0, 0]
        q = quant4x4(w, qpc)
        ac_blocks[blk] = mat_to_scan(q, offset=1)
    dc_levels = quant_dc_chroma(hadamard2(dc_w), qpc)
    return dc_levels, ac_blocks
