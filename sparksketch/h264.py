"""H.264 baseline INTRA codec — pure NumPy/Python, the media tier's real
frame-decode layer.

What this is (precisely): a conformant SUBSET of ITU-T H.264 / ISO 14496-10
baseline profile — IDR-led GOPs of one-slice I and P pictures, CAVLC
entropy mode, 4:2:0 8-bit, frame_mbs_only; intra macroblock types
**I_PCM**, **Intra_16x16** and **Intra_4x4**; inter macroblock types
**P_L0_16x16** and **P_Skip** (one reference picture, full-sample luma
motion with spec 8.4.2.2.1 edge clamping, EXACT eighth-sample bilinear
chroma interpolation per 8.4.2.2.2, median motion-vector prediction
8.4.1.3, the P_Skip inference 8.4.1.1, mb_skip_run coding, and the
Table 9-4 inter coded_block_pattern mapping) — all with full coded
residuals
(CodedBlockPattern via Table 7-11 / the Table 9-4 me(v) mapping —
quantized 4x4 transform coefficients through the complete CAVLC layer:
coeff_token Table 9-5 incl. the chroma-DC column and the nC>=8 FLC,
adaptive level prefix/suffix 9.2.2, total_zeros Tables 9-7/9-8/9-9(a),
run_before Table 9-10 — see h264_residual.py), loop filter disabled via
the slice header (disable_deblocking_filter_idc = 1, so a PPS with
deblocking_filter_control_present is required — mp4.encode_pps(True)).

The ENCODER makes a real per-macroblock rate-distortion choice: the best
available Intra_16x16 luma prediction (Vertical / Horizontal / DC / Plane,
spec 8.3.3) against a full Intra_4x4 trial (all nine 8.3.1 modes per 4x4
block, chosen by prediction SAD with a most-probable-mode bias), each
residual-coded at ``qp``, plus the best chroma 8x8 prediction (DC /
Horizontal / Vertical / Plane, spec 8.3.4); the winner is used whenever
its RECONSTRUCTION approximates the source within ``pcm_mad``
mean-absolute-difference per sample, else lossless I_PCM.  Prediction runs
off the RECONSTRUCTED neighbor samples, exactly as a decoder sees them,
and the encoder reconstructs through the decoder's own
dequant/inverse-transform functions, so the decoder's output is
bit-identical to the encoder's reconstruction (tested in
tests/test_h264.py, tests/test_h264_i4x4.py).

The DECODER accepts any stream inside the subset — including full CAVLC
residual decode with the per-4x4-block nC neighbor context (I_PCM
neighbors counting 16 per spec 9.2.1), Intra_4x4 most-probable-mode
signalling (8.3.1.1) with decode-order sample availability, per-MB QP
tracking via mb_qp_delta, and the chroma QP mapping of Table 8-15.
Anything OUTSIDE the subset raises NotImplementedError naming the
feature: the remaining seam is B direct/skip modes and sub-16x16 B
partitions, weighted BIprediction (the B-slice variant), CABAC, and
the loop filter.  Inside the subset as of round 5: explicit weighted
prediction for P slices (pred_weight_table 7.3.5.4, the 8.4.2.3.2
sample op, an auto least-squares fade fit); B slices (B_L0_16x16 /
B_L1_16x16 / B_Bi_16x16 with default-average biprediction,
non-reference NALs, POC-split reference lists, display-order
reordering in decode_gop); quarter-sample luma motion
(8.4.2.2.1: the 6-tap half-sample filter, the two-stage center sample,
Table 8-12 quarter averaging); the full P-slice partition tree —
P_16x8 / P_8x16 (Table 7-13) and P_8x8 with 8x8 / 8x4 / 4x8 / 4x4
sub-partitions (Table 7-14) — with directional MV prediction (8.4.1.3)
at 4x4-block granularity and sequential intra-MB partition prediction;
and multiple reference pictures (sliding-window DPB, te(v) ref_idx_l0
per partition / per 8x8 quadrant, refidx-keyed neighbor matching in
the MV predictor, P_8x8ref0 inference).

Why a per-macroblock Python loop is acceptable here: fixture media frames
are tiny (a few dozen macroblocks) and the codec runs INSIDE mapInPandas —
the distributed plumbing around it (schema, partitioning, batch shape) is
the 100 TB-relevant part, per the LLM-pipeline brief.  The reference repo
(Claudenw/BloomFilters) has no media scope; this module belongs to the
pipeline tier, like jpeg.py / png.py.
"""
from __future__ import annotations

import struct

import numpy as np

from . import h264_residual as hr
from .mp4 import _BitReader, _BitWriter, _unescape_rbsp, parse_avcc, \
    parse_pps, parse_sps

__all__ = ["encode_iframe", "decode_iframe", "avc_sample",
           "decode_avc_sample", "rgb_to_yuv420", "yuv420_to_rgb"]

# luma Intra_16x16 prediction modes (spec 8.3.3)
_L_V, _L_H, _L_DC, _L_PLANE = 0, 1, 2, 3
# chroma prediction modes (spec 8.3.4) — NOTE the different numbering
_C_DC, _C_H, _C_V, _C_PLANE = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# color / 4:2:0 (BT.601 full-range, same matrix as jpeg.py's JFIF path)
# ---------------------------------------------------------------------------

def rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
    """(h, w, 3) uint8 RGB -> (Y, Cb, Cr) uint8 planes, chroma 2x2-mean
    subsampled.  h and w must be even (4:2:0 chroma grid == SPS crop
    units)."""
    h, w = rgb.shape[:2]
    if h % 2 or w % 2:
        raise ValueError(f"4:2:0 needs even dims, got {w}x{h}")
    p = rgb.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    sub = (lambda c: (c[0::2, 0::2] + c[1::2, 0::2]
                      + c[0::2, 1::2] + c[1::2, 1::2]) / 4.0)
    to8 = (lambda c: np.clip(np.round(c), 0, 255).astype(np.uint8))
    return to8(y), to8(sub(cb)), to8(sub(cr))


def yuv420_to_rgb(Y: np.ndarray, Cb: np.ndarray, Cr: np.ndarray) \
        -> np.ndarray:
    """Inverse of rgb_to_yuv420 (nearest chroma upsample)."""
    y = Y.astype(np.float64)
    cb = np.repeat(np.repeat(Cb.astype(np.float64), 2, 0), 2, 1)
    cb = cb[:y.shape[0], :y.shape[1]] - 128.0
    cr = np.repeat(np.repeat(Cr.astype(np.float64), 2, 0), 2, 1)
    cr = cr[:y.shape[0], :y.shape[1]] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


# ---------------------------------------------------------------------------
# intra prediction (spec 8.3.3 / 8.3.4) — shared verbatim by encoder and
# decoder; all inputs are RECONSTRUCTED planes, so both sides agree
# bit-for-bit
# ---------------------------------------------------------------------------

def _pred_luma16(rec: np.ndarray, x0: int, y0: int) -> dict[int, np.ndarray]:
    """Available Intra_16x16 predictions for the MB at luma sample
    (x0, y0).  Returns {mode: (16,16) uint8}."""
    up = y0 > 0
    left = x0 > 0
    out: dict[int, np.ndarray] = {}
    prow = rec[y0 - 1, x0:x0 + 16].astype(np.int64) if up else None
    pcol = rec[y0:y0 + 16, x0 - 1].astype(np.int64) if left else None
    if up:
        out[_L_V] = np.broadcast_to(prow, (16, 16)).astype(np.uint8)
    if left:
        out[_L_H] = np.broadcast_to(pcol[:, None], (16, 16)).astype(np.uint8)
    # DC (8.3.3.3): always available with fallbacks
    if up and left:
        dc = (int(prow.sum()) + int(pcol.sum()) + 16) >> 5
    elif up:
        dc = (int(prow.sum()) + 8) >> 4
    elif left:
        dc = (int(pcol.sum()) + 8) >> 4
    else:
        dc = 128
    out[_L_DC] = np.full((16, 16), dc, dtype=np.uint8)
    # Plane (8.3.3.4): needs up, left AND the up-left corner
    if up and left:
        corner = int(rec[y0 - 1, x0 - 1])
        uprow = np.concatenate(([corner], prow))     # p[x, -1], x=-1..15
        leftcol = np.concatenate(([corner], pcol))   # p[-1, y], y=-1..15
        hh = sum((xp + 1) * (int(uprow[9 + xp]) - int(uprow[7 - xp]))
                 for xp in range(8))
        vv = sum((yp + 1) * (int(leftcol[9 + yp]) - int(leftcol[7 - yp]))
                 for yp in range(8))
        a = 16 * (int(leftcol[16]) + int(uprow[16]))
        b = (5 * hh + 32) >> 6
        c = (5 * vv + 32) >> 6
        xs = np.arange(16)
        plane = (a + b * (xs[None, :] - 7) + c * (xs[:, None] - 7) + 16) >> 5
        out[_L_PLANE] = np.clip(plane, 0, 255).astype(np.uint8)
    return out


def _pred_chroma8(rec: np.ndarray, x0: int, y0: int) \
        -> dict[int, np.ndarray]:
    """Available chroma 8x8 predictions at chroma sample (x0, y0).
    Returns {mode: (8,8) uint8}."""
    up = y0 > 0
    left = x0 > 0
    out: dict[int, np.ndarray] = {}
    prow = rec[y0 - 1, x0:x0 + 8].astype(np.int64) if up else None
    pcol = rec[y0:y0 + 8, x0 - 1].astype(np.int64) if left else None
    # DC (8.3.4.1): per 4x4 sub-block with positional preferences
    dcp = np.empty((8, 8), dtype=np.uint8)
    for by in (0, 4):
        for bx in (0, 4):
            u4 = int(prow[bx:bx + 4].sum()) if up else None
            l4 = int(pcol[by:by + 4].sum()) if left else None
            if bx == by:  # corner blocks (0,0)/(4,4): both if available
                if up and left:
                    v = (u4 + l4 + 4) >> 3
                elif up:
                    v = (u4 + 2) >> 2
                elif left:
                    v = (l4 + 2) >> 2
                else:
                    v = 128
            elif bx == 4:  # (4,0): prefers up
                v = (u4 + 2) >> 2 if up else \
                    ((l4 + 2) >> 2 if left else 128)
            else:  # (0,4): prefers left
                v = (l4 + 2) >> 2 if left else \
                    ((u4 + 2) >> 2 if up else 128)
            dcp[by:by + 4, bx:bx + 4] = v
    out[_C_DC] = dcp
    if left:
        out[_C_H] = np.broadcast_to(pcol[:, None], (8, 8)).astype(np.uint8)
    if up:
        out[_C_V] = np.broadcast_to(prow, (8, 8)).astype(np.uint8)
    if up and left:  # Plane (8.3.4.4, 4:2:0)
        corner = int(rec[y0 - 1, x0 - 1])
        uprow = np.concatenate(([corner], prow))
        leftcol = np.concatenate(([corner], pcol))
        hh = sum((xp + 1) * (int(uprow[5 + xp]) - int(uprow[3 - xp]))
                 for xp in range(4))
        vv = sum((yp + 1) * (int(leftcol[5 + yp]) - int(leftcol[3 - yp]))
                 for yp in range(4))
        a = 16 * (int(leftcol[8]) + int(uprow[8]))
        b = (34 * hh + 32) >> 6
        c = (34 * vv + 32) >> 6
        xs = np.arange(8)
        plane = (a + b * (xs[None, :] - 3) + c * (xs[:, None] - 3) + 16) >> 5
        out[_C_PLANE] = np.clip(plane, 0, 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Intra_4x4 prediction (spec 8.3.1) — the 9 per-4x4-block modes, sample
# availability from a decode-order grid, and the most-probable-mode
# signalling of 8.3.1.1
# ---------------------------------------------------------------------------

# Intra4x4PredMode names (Table 8-2)
_I4_V, _I4_H, _I4_DC, _I4_DDL, _I4_DDR, _I4_VR, _I4_HD, _I4_VL, _I4_HU = \
    range(9)


def _pred_luma4(rec: np.ndarray, x0: int, y0: int,
                decoded: np.ndarray) -> dict[int, np.ndarray]:
    """Available Intra_4x4 predictions for the block at luma sample
    (x0, y0).  ``decoded`` is the absolute 4x4-block boolean grid of
    already-reconstructed blocks — availability is pure decode order, so
    the classic 'block 3/7/11/13/15 has no top-right' pattern and the
    across-MB cases all fall out of it.  Returns {mode: (4,4) uint8}."""
    bh, bw = decoded.shape
    bx, by = x0 // 4, y0 // 4

    def dec(bx_, by_):
        return 0 <= bx_ < bw and 0 <= by_ < bh and decoded[by_, bx_]

    left = dec(bx - 1, by)
    top = dec(bx, by - 1)
    corner = dec(bx - 1, by - 1)
    topright = dec(bx + 1, by - 1)
    l = rec[y0:y0 + 4, x0 - 1].astype(np.int64) if left else None
    t = np.empty(8, dtype=np.int64) if top else None
    if top:
        t[:4] = rec[y0 - 1, x0:x0 + 4]
        if topright:
            t[4:] = rec[y0 - 1, x0 + 4:x0 + 8]
        else:  # 8.3.1.2: substitute p[3,-1] for unavailable p[4..7,-1]
            t[4:] = t[3]
    c = int(rec[y0 - 1, x0 - 1]) if corner else None

    def px(i):  # p[i, -1] with p[-1, -1] = corner
        return c if i < 0 else int(t[i])

    def pl(i):  # p[-1, i] with p[-1, -1] = corner
        return c if i < 0 else int(l[i])

    out: dict[int, np.ndarray] = {}
    if top:
        out[_I4_V] = np.broadcast_to(t[:4], (4, 4)).astype(np.uint8)
    if left:
        out[_I4_H] = np.broadcast_to(l[:, None], (4, 4)).astype(np.uint8)
    if top and left:
        dc = (int(t[:4].sum()) + int(l.sum()) + 4) >> 3
    elif top:
        dc = (int(t[:4].sum()) + 2) >> 2
    elif left:
        dc = (int(l.sum()) + 2) >> 2
    else:
        dc = 128
    out[_I4_DC] = np.full((4, 4), dc, dtype=np.uint8)
    if top:
        p = np.empty((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y, x] = (px(6) + 3 * px(7) + 2) >> 2
                else:
                    p[y, x] = (px(x + y) + 2 * px(x + y + 1)
                               + px(x + y + 2) + 2) >> 2
        out[_I4_DDL] = p.astype(np.uint8)
        p = np.empty((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                if y % 2 == 0:
                    p[y, x] = (px(x + (y >> 1))
                               + px(x + (y >> 1) + 1) + 1) >> 1
                else:
                    p[y, x] = (px(x + (y >> 1)) + 2 * px(x + (y >> 1) + 1)
                               + px(x + (y >> 1) + 2) + 2) >> 2
        out[_I4_VL] = p.astype(np.uint8)
    if left:
        p = np.empty((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z in (0, 2, 4):
                    p[y, x] = (pl(y + (x >> 1))
                               + pl(y + (x >> 1) + 1) + 1) >> 1
                elif z in (1, 3):
                    p[y, x] = (pl(y + (x >> 1)) + 2 * pl(y + (x >> 1) + 1)
                               + pl(y + (x >> 1) + 2) + 2) >> 2
                elif z == 5:
                    p[y, x] = (pl(2) + 3 * pl(3) + 2) >> 2
                else:
                    p[y, x] = pl(3)
        out[_I4_HU] = p.astype(np.uint8)
    if top and left and corner:
        p = np.empty((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y, x] = (px(x - y - 2) + 2 * px(x - y - 1)
                               + px(x - y) + 2) >> 2
                elif x < y:
                    p[y, x] = (pl(y - x - 2) + 2 * pl(y - x - 1)
                               + pl(y - x) + 2) >> 2
                else:
                    p[y, x] = (px(0) + 2 * c + pl(0) + 2) >> 2
        out[_I4_DDR] = p.astype(np.uint8)
        p = np.empty((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z in (0, 2, 4, 6):
                    p[y, x] = (px(x - (y >> 1) - 1)
                               + px(x - (y >> 1)) + 1) >> 1
                elif z in (1, 3, 5):
                    p[y, x] = (px(x - (y >> 1) - 2)
                               + 2 * px(x - (y >> 1) - 1)
                               + px(x - (y >> 1)) + 2) >> 2
                elif z == -1:
                    p[y, x] = (pl(0) + 2 * c + px(0) + 2) >> 2
                else:
                    p[y, x] = (pl(y - 1) + 2 * pl(y - 2)
                               + pl(y - 3) + 2) >> 2
        out[_I4_VR] = p.astype(np.uint8)
        p = np.empty((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z in (0, 2, 4, 6):
                    p[y, x] = (pl(y - (x >> 1) - 1)
                               + pl(y - (x >> 1)) + 1) >> 1
                elif z in (1, 3, 5):
                    p[y, x] = (pl(y - (x >> 1) - 2)
                               + 2 * pl(y - (x >> 1) - 1)
                               + pl(y - (x >> 1)) + 2) >> 2
                elif z == -1:
                    p[y, x] = (px(0) + 2 * c + pl(0) + 2) >> 2
                else:
                    p[y, x] = (px(x - 1) + 2 * px(x - 2)
                               + px(x - 3) + 2) >> 2
        out[_I4_HD] = p.astype(np.uint8)
    return out


def _most_probable_i4_mode(modes: np.ndarray, bx: int, by: int) -> int:
    """8.3.1.1: predIntra4x4PredMode = min(modeA, modeB); a neighbor
    outside the picture or not coded as Intra_4x4 counts as DC (the
    ``modes`` grid holds -1 there)."""
    bh, bw = modes.shape
    ma = modes[by, bx - 1] if bx > 0 else -1
    mb = modes[by - 1, bx] if by > 0 else -1
    ma = _I4_DC if ma < 0 else int(ma)
    mb = _I4_DC if mb < 0 else int(mb)
    return min(ma, mb)


# coded_block_pattern me(v) mapping for intra MBs, ChromaArrayType = 1
# (Table 9-4, column Intra_4x4): codeNum -> cbp
_CBP_INTRA = (47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
              16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4, 8,
              17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
_CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(_CBP_INTRA)}
assert len(_CBP_INTRA_INV) == 48  # the table must be a permutation

# Table 9-4, column Inter: codeNum -> cbp (P/B macroblocks)
_CBP_INTER = (0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13, 14,
              6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46, 17,
              18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)
_CBP_INTER_INV = {cbp: i for i, cbp in enumerate(_CBP_INTER)}
assert len(_CBP_INTER_INV) == 48


# ---------------------------------------------------------------------------
# inter prediction (spec 8.4) — P_L0_16x16 + P_Skip subset: QUARTER-sample
# luma motion compensation (8.4.2.2.1: the (1,-5,20,20,-5,1)/32 6-tap
# half-sample filter, the two-stage center sample j, and the averaging
# quarter positions of Table 8-12), EXACT eighth-sample bilinear chroma
# interpolation (8.4.2.2.2), median motion-vector prediction (8.4.1.3)
# and the P_Skip inference (8.4.1.1).  Motion vectors are stored in
# quarter-luma-sample units, one per MB (16x16 partitions only).
# ---------------------------------------------------------------------------

_QPEL_TAPS = np.array([1, -5, 20, 20, -5, 1], dtype=np.int64)


def _mc_luma(ref: np.ndarray, x0: int, y0: int, mv: tuple[int, int],
             size: tuple[int, int] = (16, 16)) -> np.ndarray:
    """``size`` = (bh, bw) luma prediction at (x0, y0) displaced by
    ``mv`` (quarter units), per spec 8.4.2.2.1.  Full-sample reference
    coordinates are clamped to the picture independently per axis (the
    8.4.2.2.1 edge clip), so motion past the border repeats edge
    samples — fractional positions filter over the clamped fetch
    exactly as the spec's Clip3'd addressing does.

    Half-sample positions use the 6-tap filter; the center position j is
    the two-stage filter over UN-normalized horizontal intermediates
    (separable, so filtering b1 columns equals the spec's choice of
    either axis); quarter positions average the two nearest
    integer/half samples with upward rounding (Table 8-12)."""
    bh, bw = size
    h, w = ref.shape
    xi, xf = mv[0] >> 2, mv[0] & 3
    yi, yf = mv[1] >> 2, mv[1] & 3
    if xf == 0 and yf == 0:
        ys = np.clip(np.arange(y0 + yi, y0 + yi + bh), 0, h - 1)
        xs = np.clip(np.arange(x0 + xi, x0 + xi + bw), 0, w - 1)
        return ref[np.ix_(ys, xs)]
    # (bh+6)x(bw+6) clamped window covering offsets [-2, bh/bw+3] around
    # the integer anchor: bh/bw outputs + 5-tap margin + 1 extra for the
    # quarter positions' H/M/m/s (+1-shifted) neighbors
    ys = np.clip(np.arange(y0 + yi - 2, y0 + yi + bh + 4), 0, h - 1)
    xs = np.clip(np.arange(x0 + xi - 2, x0 + xi + bw + 4), 0, w - 1)
    win = ref[np.ix_(ys, xs)].astype(np.int64)
    G = win[2:bh + 3, 2:bw + 3]                      # integer, +1 margin
    # b1: un-normalized half-horizontal at the bw+1 output cols, all rows
    b1 = sum(t * win[:, o:o + bw + 1] for o, t in enumerate(_QPEL_TAPS))
    b = np.clip((b1[2:bh + 3] + 16) >> 5, 0, 255)
    h1 = sum(t * win[o:o + bh + 1, :] for o, t in enumerate(_QPEL_TAPS))
    hh = np.clip((h1[:, 2:bw + 3] + 16) >> 5, 0, 255)
    j1 = sum(t * b1[o:o + bh + 1, :] for o, t in enumerate(_QPEL_TAPS))
    j = np.clip((j1 + 512) >> 10, 0, 255)

    def s(a):
        return a[:bh, :bw]

    def sx(a):          # +1 column: H (integer) / m (half-vert) neighbor
        return a[:bh, 1:bw + 1]

    def sy(a):          # +1 row: M (integer) / s (half-horiz) neighbor
        return a[1:bh + 1, :bw]

    table = {
        (1, 0): (s(G), s(b)), (3, 0): (s(b), sx(G)),      # a, c
        (0, 1): (s(G), s(hh)), (1, 1): (s(b), s(hh)),     # d, e
        (2, 1): (s(b), s(j)), (3, 1): (s(b), sx(hh)),     # f, g
        (1, 2): (s(hh), s(j)), (3, 2): (s(j), sx(hh)),    # i, k
        (0, 3): (s(hh), sy(G)), (1, 3): (s(hh), sy(b)),   # n, p
        (2, 3): (s(j), sy(b)), (3, 3): (sx(hh), sy(b)),   # q, r
    }
    if (xf, yf) == (2, 0):
        out = s(b)
    elif (xf, yf) == (0, 2):
        out = s(hh)
    elif (xf, yf) == (2, 2):
        out = s(j)
    else:
        u, v = table[(xf, yf)]
        out = (u + v + 1) >> 1
    return out.astype(np.uint8)


def _mc_chroma(ref: np.ndarray, cx0: int, cy0: int,
               mv: tuple[int, int],
               size: tuple[int, int] = (8, 8)) -> np.ndarray:
    """``size`` = (ch, cw) chroma prediction (4:2:0): the luma
    quarter-sample mv is an EIGHTH-chroma-sample displacement; bilinear
    per spec 8.4.2.2.2 with edge-clamped integer positions."""
    ch, cw = size
    h, w = ref.shape
    xi, xf = mv[0] >> 3, mv[0] & 7
    yi, yf = mv[1] >> 3, mv[1] & 7
    ys = np.clip(np.arange(cy0 + yi, cy0 + yi + ch + 1), 0, h - 1)
    xs = np.clip(np.arange(cx0 + xi, cx0 + xi + cw + 1), 0, w - 1)
    win = ref[np.ix_(ys, xs)].astype(np.int64)
    a = win[:ch, :cw]
    b = win[:ch, 1:]
    c = win[1:, :cw]
    d = win[1:, 1:]
    return (((8 - xf) * (8 - yf) * a + xf * (8 - yf) * b
             + (8 - xf) * yf * c + xf * yf * d + 32) >> 6).astype(np.uint8)


def _wp_apply(pred: np.ndarray, w_: int, o_: int, d: int) -> np.ndarray:
    """Explicit weighted-prediction sample op (spec 8.4.2.3.2, single
    list): ((p*w + 2^(d-1)) >> d) + o, clipped — applied AFTER
    interpolation."""
    p = pred.astype(np.int64)
    if d > 0:
        p = ((p * w_ + (1 << (d - 1))) >> d) + o_
    else:
        p = p * w_ + o_
    return np.clip(p, 0, 255).astype(np.uint8)


def _nb_blk(mvs4: np.ndarray, ref4: np.ndarray, decoded: np.ndarray,
            bx: int, by: int):
    """(mv, refidx, available) for 4x4 luma block (bx, by) — available
    means inside the picture AND already decoded (decode order matters
    once partitions inside one MB predict from each other).  ``ref4``
    holds the reference index per block, -1 for intra; an intra or
    unavailable neighbor contributes mv 0 and refidx -1 (no reference
    match, spec 8.4.1.3.2)."""
    h4, w4 = ref4.shape
    if 0 <= bx < w4 and 0 <= by < h4 and decoded[by, bx]:
        return ((int(mvs4[by, bx, 0]), int(mvs4[by, bx, 1])),
                int(ref4[by, bx]), True)
    return (0, 0), -1, False


def _neighbor_mvs(mvs4: np.ndarray, ref4: np.ndarray,
                  decoded: np.ndarray, bx: int, by: int, w_blk: int):
    """A (left), B (up), C (up-right, with the D up-left substitution
    when C is unavailable) for the partition whose top-left 4x4 block is
    (bx, by) and whose width is ``w_blk`` blocks (8.4.1.3.2)."""
    a = _nb_blk(mvs4, ref4, decoded, bx - 1, by)
    b = _nb_blk(mvs4, ref4, decoded, bx, by - 1)
    c = _nb_blk(mvs4, ref4, decoded, bx + w_blk, by - 1)
    if not c[2]:
        c = _nb_blk(mvs4, ref4, decoded, bx - 1, by - 1)
    return a, b, c


def _mv_pred(mvs4: np.ndarray, ref4: np.ndarray, decoded: np.ndarray,
             bx: int, by: int, w_blk: int, part: str | None = None,
             refidx: int = 0) -> tuple[int, int]:
    """MV predictor (spec 8.4.1.3) for a partition referencing picture
    ``refidx``, at 4x4-block granularity.  ``part`` selects the
    16x8/8x16 directional rules (use the neighbor verbatim when its
    reference MATCHES): '16x8_top' -> B, '16x8_bot' -> A,
    '8x16_left' -> A, '8x16_right' -> C; all other shapes take the
    median.  In the median, an inter neighbor with a DIFFERENT refidx
    still contributes its actual mv (only unavailable/intra neighbors
    contribute 0) — but the exactly-one shortcut keys on refidx
    equality."""
    (a, ra, a_av), (b, rb, b_av), (c, rc, c_av) = \
        _neighbor_mvs(mvs4, ref4, decoded, bx, by, w_blk)
    if part == "16x8_top" and rb == refidx:
        return b
    if part in ("16x8_bot", "8x16_left") and ra == refidx:
        return a
    if part == "8x16_right" and rc == refidx:
        return c
    if not b_av and not c_av and a_av:
        return a  # 8.4.1.3.1: only the left neighbor is in the picture
    matches = [mv for mv, rn in ((a, ra), (b, rb), (c, rc))
               if rn == refidx]
    if len(matches) == 1:  # exactly one neighbor references this picture
        return matches[0]
    ax, ay = a if ra >= 0 else (0, 0)
    bx_, by_ = b if rb >= 0 else (0, 0)
    cx, cy_ = c if rc >= 0 else (0, 0)
    return (int(np.median([ax, bx_, cx])), int(np.median([ay, by_, cy_])))


def _mv_pred_16x16(mvs4: np.ndarray, ref4: np.ndarray,
                   decoded: np.ndarray, mbx: int, mby: int,
                   refidx: int = 0) -> tuple[int, int]:
    """Median MV predictor for a P_L0_16x16 partition."""
    return _mv_pred(mvs4, ref4, decoded, mbx * 4, mby * 4, 4,
                    refidx=refidx)


def _recon_luma_blocks4(pred: np.ndarray, blocks, qp: int) -> np.ndarray:
    """Reconstruct a 16x16 luma MB from a prediction plus 16 plain
    4x4 residual blocks (16 coefficients each, LUMA_BLOCK_ORDER) — the
    inter / Intra_4x4 residual layout (no separate DC transform)."""
    out = np.empty((16, 16), dtype=np.uint8)
    pred = np.asarray(pred, dtype=np.int64)
    for blk, (ox, oy) in enumerate(hr.LUMA_BLOCK_ORDER):
        x, y = ox * 4, oy * 4
        res = hr.inv4x4(hr.dequant4x4_ac(hr.scan_to_mat(blocks[blk]), qp))
        out[y:y + 4, x:x + 4] = np.clip(
            pred[y:y + 4, x:x + 4] + res, 0, 255).astype(np.uint8)
    return out


def _skip_mv(mvs4: np.ndarray, ref4: np.ndarray, decoded: np.ndarray,
             mbx: int, mby: int) -> tuple[int, int]:
    """P_Skip motion inference (spec 8.4.1.1; always refidx 0)."""
    bx0, by0 = mbx * 4, mby * 4
    a, ra, a_av = _nb_blk(mvs4, ref4, decoded, bx0 - 1, by0)
    b, rb, b_av = _nb_blk(mvs4, ref4, decoded, bx0, by0 - 1)
    if not a_av or not b_av:
        return (0, 0)
    if (ra == 0 and a == (0, 0)) or (rb == 0 and b == (0, 0)):
        return (0, 0)
    return _mv_pred_16x16(mvs4, ref4, decoded, mbx, mby, refidx=0)


# P macroblock partitionings (Table 7-13 mb_type 0-3): per partition its
# directional-prediction tag, the (x, y) offset and size inside the MB in
# 4x4-block units, in partition decode order.
_P_SHAPES = {
    "16x16": (0, [(None, 0, 0, 4, 4)]),
    "16x8": (1, [("16x8_top", 0, 0, 4, 2), ("16x8_bot", 0, 2, 4, 2)]),
    "8x16": (2, [("8x16_left", 0, 0, 2, 4), ("8x16_right", 2, 0, 2, 4)]),
    "8x8": (3, [(None, 0, 0, 2, 2), (None, 2, 0, 2, 2),
                (None, 0, 2, 2, 2), (None, 2, 2, 2, 2)]),
}
_P_SHAPE_BY_TYPE = {mbt: (shape, plist)
                    for shape, (mbt, plist) in _P_SHAPES.items()}

# P_8x8 sub-partition shapes (Table 7-14 sub_mb_type 0-3): (x, y) offset
# and size in 4x4-block units relative to the 8x8 quadrant, in
# sub-partition decode order.
_SUB_SHAPES = {
    0: [(0, 0, 2, 2)],                                   # P_L0_8x8
    1: [(0, 0, 2, 1), (0, 1, 2, 1)],                     # P_L0_8x4
    2: [(0, 0, 1, 2), (1, 0, 1, 2)],                     # P_L0_4x8
    3: [(0, 0, 1, 1), (1, 0, 1, 1),
        (0, 1, 1, 1), (1, 1, 1, 1)],                     # P_L0_4x4
}
# quadrant origins inside the MB, 4x4-block units, decode order
_QUADRANTS = ((0, 0), (2, 0), (0, 2), (2, 2))


def _p8x8_plist(sub_types):
    """Partition list (tag, ox, oy, wb, hb) for a P_8x8 MB with the
    given four sub_mb_types, in decode order."""
    plist = []
    for (qox, qoy), smt in zip(_QUADRANTS, sub_types):
        for sox, soy, swb, shb in _SUB_SHAPES[smt]:
            plist.append((None, qox + sox, qoy + soy, swb, shb))
    return plist


# ---------------------------------------------------------------------------
# Intra_16x16 residual syntax (spec 7.3.5.3 residual_data, CAVLC) — the
# block-by-block read/write order shared by encoder and decoder, with the
# per-4x4 TotalCoeff context grids of 9.2.1 (I_PCM cells hold 16)
# ---------------------------------------------------------------------------

class _CoeffCtx:
    """Per-4x4-block TotalCoeff grids for CAVLC nC derivation."""

    def __init__(self, mbs_w: int, mbs_h: int):
        self.luma = np.zeros((mbs_h * 4, mbs_w * 4), dtype=np.int16)
        self.cb = np.zeros((mbs_h * 2, mbs_w * 2), dtype=np.int16)
        self.cr = np.zeros((mbs_h * 2, mbs_w * 2), dtype=np.int16)

    def mark_pcm(self, mbx: int, mby: int) -> None:
        self.luma[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 16
        self.cb[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 16
        self.cr[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 16


def _write_i16_residual(w: _BitWriter, ctx: _CoeffCtx, mbx: int, mby: int,
                        dcL: np.ndarray, acL, cbp_luma: int,
                        dcCb: np.ndarray, acCb, dcCr: np.ndarray, acCr,
                        cbp_chroma: int) -> None:
    bx0, by0 = mbx * 4, mby * 4
    # Intra16x16DCLevel: zig-zag of the (4,4) DC matrix; nC as for luma
    # block 0; its TotalCoeff does NOT enter the context grid
    hr.write_residual_block(w, hr.mat_to_scan(dcL),
                            hr.nc_from_grid(ctx.luma, bx0, by0))
    if cbp_luma:
        for blk, (ox, oy) in enumerate(hr.LUMA_BLOCK_ORDER):
            nc = hr.nc_from_grid(ctx.luma, bx0 + ox, by0 + oy)
            ctx.luma[by0 + oy, bx0 + ox] = \
                hr.write_residual_block(w, acL[blk], nc)
    _write_chroma_residual(w, ctx, mbx, mby, dcCb, acCb, dcCr, acCr,
                           cbp_chroma)


def _write_chroma_residual(w: _BitWriter, ctx: _CoeffCtx, mbx: int,
                           mby: int, dcCb: np.ndarray, acCb,
                           dcCr: np.ndarray, acCr,
                           cbp_chroma: int) -> None:
    cx0, cy0 = mbx * 2, mby * 2
    if cbp_chroma:
        hr.write_residual_block(w, dcCb.reshape(-1), -1)
        hr.write_residual_block(w, dcCr.reshape(-1), -1)
    if cbp_chroma == 2:
        for grid, ac in ((ctx.cb, acCb), (ctx.cr, acCr)):
            for blk, (ox, oy) in enumerate(hr.CHROMA_BLOCK_ORDER):
                nc = hr.nc_from_grid(grid, cx0 + ox, cy0 + oy)
                grid[cy0 + oy, cx0 + ox] = \
                    hr.write_residual_block(w, ac[blk], nc)


def _read_i16_residual(r: _BitReader, ctx: _CoeffCtx, mbx: int, mby: int,
                       cbp_luma: int, cbp_chroma: int):
    """-> (dcL (4,4), acL 16x[15] | None, dcCb (2,2), acCb | None,
    dcCr, acCr)."""
    bx0, by0 = mbx * 4, mby * 4
    dc_scan, _ = hr.read_residual_block(
        r, hr.nc_from_grid(ctx.luma, bx0, by0), 16)
    dcL = hr.scan_to_mat(dc_scan)
    acL = None
    if cbp_luma:
        acL = []
        for blk, (ox, oy) in enumerate(hr.LUMA_BLOCK_ORDER):
            nc = hr.nc_from_grid(ctx.luma, bx0 + ox, by0 + oy)
            coeffs, tc = hr.read_residual_block(r, nc, 15)
            ctx.luma[by0 + oy, bx0 + ox] = tc
            acL.append(coeffs)
    return (dcL, acL) + _read_chroma_residual(r, ctx, mbx, mby, cbp_chroma)


def _read_chroma_residual(r: _BitReader, ctx: _CoeffCtx, mbx: int,
                          mby: int, cbp_chroma: int):
    """-> (dcCb (2,2), acCb | None, dcCr, acCr)."""
    cx0, cy0 = mbx * 2, mby * 2
    dcCb = np.zeros((2, 2), dtype=np.int64)
    dcCr = np.zeros((2, 2), dtype=np.int64)
    if cbp_chroma:
        dcCb = hr.read_residual_block(r, -1, 4)[0].reshape(2, 2)
        dcCr = hr.read_residual_block(r, -1, 4)[0].reshape(2, 2)
    acCb = acCr = None
    if cbp_chroma == 2:
        acCb, acCr = [], []
        for grid, acc in ((ctx.cb, acCb), (ctx.cr, acCr)):
            for blk, (ox, oy) in enumerate(hr.CHROMA_BLOCK_ORDER):
                nc = hr.nc_from_grid(grid, cx0 + ox, cy0 + oy)
                coeffs, tc = hr.read_residual_block(r, nc, 15)
                grid[cy0 + oy, cx0 + ox] = tc
                acc.append(coeffs)
    return dcCb, acCb, dcCr, acCr


def _write_i4_luma_residual(w: _BitWriter, ctx: _CoeffCtx, mbx: int,
                            mby: int, blocks16, cbp_luma: int) -> None:
    """LumaLevel4x4 residual blocks (16 coefficients, DC included) for
    the 8x8 groups whose CodedBlockPatternLuma bit is set."""
    bx0, by0 = mbx * 4, mby * 4
    for i8 in range(4):
        if not cbp_luma & (1 << i8):
            continue
        for i4 in range(4):
            blk = i8 * 4 + i4
            ox, oy = hr.LUMA_BLOCK_ORDER[blk]
            nc = hr.nc_from_grid(ctx.luma, bx0 + ox, by0 + oy)
            ctx.luma[by0 + oy, bx0 + ox] = \
                hr.write_residual_block(w, blocks16[blk], nc)


def _read_i4_luma_residual(r: _BitReader, ctx: _CoeffCtx, mbx: int,
                           mby: int, cbp_luma: int) -> list[np.ndarray]:
    """-> 16-entry list of 16-coefficient scan-order vectors (zeros for
    8x8 groups whose cbp bit is clear)."""
    bx0, by0 = mbx * 4, mby * 4
    out = [np.zeros(16, dtype=np.int64) for _ in range(16)]
    for i8 in range(4):
        if not cbp_luma & (1 << i8):
            continue
        for i4 in range(4):
            blk = i8 * 4 + i4
            ox, oy = hr.LUMA_BLOCK_ORDER[blk]
            nc = hr.nc_from_grid(ctx.luma, bx0 + ox, by0 + oy)
            coeffs, tc = hr.read_residual_block(r, nc, 16)
            ctx.luma[by0 + oy, bx0 + ox] = tc
            out[blk] = coeffs
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _pad_mb(plane: np.ndarray, mb: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, -h % mb), (0, -w % mb)), mode="edge")


def _try_i4_mb(oY: np.ndarray, recY: np.ndarray, yx: int, yy: int,
               decoded: np.ndarray, i4modes: np.ndarray, qp: int):
    """Trial-encode one MB as Intra_4x4 on COPIES of the mutable state:
    per 4x4 block pick the available mode with the smallest prediction
    SAD (ties prefer the most probable mode, then the lower number),
    transform+quant the residual, reconstruct through the decoder path.
    -> (modes[16], blocks16 scan-order, recon (16,16) uint8, mad)."""
    recl = recY.copy()
    dec = decoded.copy()
    modes_loc = i4modes.copy()
    modes: list[int] = []
    blocks: list[np.ndarray] = []
    for blk, (ox, oy) in enumerate(hr.LUMA_BLOCK_ORDER):
        x, y = yx + ox * 4, yy + oy * 4
        bx, by = x // 4, y // 4
        src4 = oY[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4].astype(np.int64)
        preds = _pred_luma4(recl, x, y, dec)
        mpm = _most_probable_i4_mode(modes_loc, bx, by)
        mode, pred, _ = min(
            ((m, p, (int(np.abs(src4 - p.astype(np.int64)).sum()),
                     m != mpm, m))
             for m, p in preds.items()), key=lambda tt: tt[2])
        q = hr.quant4x4(hr.fwd4x4(src4 - pred.astype(np.int64)), qp)
        res = hr.inv4x4(hr.dequant4x4_ac(q, qp))
        rec4 = np.clip(pred.astype(np.int64) + res, 0, 255).astype(np.uint8)
        recl[y:y + 4, x:x + 4] = rec4
        dec[by, bx] = True
        modes_loc[by, bx] = mode
        modes.append(mode)
        blocks.append(hr.mat_to_scan(q))
    rec = recl[yy:yy + 16, yx:yx + 16]
    mad = float(np.abs(oY.astype(np.int64) - rec.astype(np.int64)).mean())
    return modes, blocks, rec.copy(), mad


def encode_iframe(rgb: np.ndarray, pcm_mad: float = 4.0,
                  qp: int = 26) -> bytes:
    """Encode one RGB frame as an IDR slice NAL (header byte 0x65
    included; wrap with ``avc_sample`` for MP4 mdat).

    Per MB: best available Intra_16x16 + chroma prediction with the
    residual transform-coded at ``qp`` — used when the RECONSTRUCTION's
    luma and chroma mean-abs-diff both stay within ``pcm_mad``, else
    lossless I_PCM.  ``pcm_mad=0`` keeps the frame lossless (I_PCM except
    exactly-reconstructed MBs); a negative value forces I_PCM everywhere.
    CodedBlockPattern bits are derived from the actual quantized levels
    (all-zero AC -> cbp_luma 0; zero chroma -> cbp_chroma 0/1/2).  The
    slice header matches mp4.encode_sps/encode_pps(deblocking_control=
    True) fixed choices (log2_max_frame_num=8, poc_type=0, poc lsb
    bits=8, pic_init_qp=26)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_iframe expects (h, w, 3) RGB")
    Y, Cb, Cr = rgb_to_yuv420(rgb)
    Y, Cb, Cr = _pad_mb(Y, 16), _pad_mb(Cb, 8), _pad_mb(Cr, 8)
    mbs_h, mbs_w = Y.shape[0] // 16, Y.shape[1] // 16
    recY = np.zeros_like(Y)
    recCb = np.zeros_like(Cb)
    recCr = np.zeros_like(Cr)
    ctx = _CoeffCtx(mbs_w, mbs_h)
    decoded = np.zeros((mbs_h * 4, mbs_w * 4), dtype=bool)
    i4modes = np.full((mbs_h * 4, mbs_w * 4), -1, dtype=np.int8)
    if not 0 <= qp <= 51:
        raise ValueError(f"qp must be in [0, 51], got {qp}")
    qpc = hr.chroma_qp(qp, 0)  # our PPS writes chroma_qp_index_offset 0

    w = _BitWriter()
    w.ue(0)            # first_mb_in_slice
    w.ue(7)            # slice_type: I (all slices of the picture)
    w.ue(0)            # pic_parameter_set_id
    w.u(0, 8)          # frame_num (log2_max_frame_num = 8)
    w.ue(0)            # idr_pic_id
    w.u(0, 8)          # pic_order_cnt_lsb (log2_max_poc_lsb = 8)
    w.u(0, 1)          # no_output_of_prior_pics_flag
    w.u(0, 1)          # long_term_reference_flag
    w.se(qp - 26)      # slice_qp_delta (pic_init_qp = 26)
    w.ue(1)            # disable_deblocking_filter_idc = 1 (filter OFF)

    for mby in range(mbs_h):
        for mbx in range(mbs_w):
            yx, yy = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            oY = Y[yy:yy + 16, yx:yx + 16]
            oCb = Cb[cy:cy + 8, cx:cx + 8]
            oCr = Cr[cy:cy + 8, cx:cx + 8]
            lp = _pred_luma16(recY, yx, yy)
            lmode, lpred, lmad = min(
                ((m, p, float(np.abs(oY.astype(np.int64)
                                     - p.astype(np.int64)).mean()))
                 for m, p in lp.items()), key=lambda t: (t[2], t[0]))
            cpb = _pred_chroma8(recCb, cx, cy)
            cpr = _pred_chroma8(recCr, cx, cy)
            cmode, cmad = min(
                ((m, (float(np.abs(oCb.astype(np.int64)
                                   - cpb[m].astype(np.int64)).mean())
                      + float(np.abs(oCr.astype(np.int64)
                                     - cpr[m].astype(np.int64)).mean()))
                  / 2.0) for m in cpb), key=lambda t: (t[1], t[0]))
            # forward transform + quant of the residual, then reconstruct
            # through the DECODER's dequant/inverse path — the PCM choice
            # is made on what the decoder will actually see
            dcL, acL = hr.transform_quant_luma16(oY, lpred, qp)
            cbp_luma = 15 if any(a.any() for a in acL) else 0
            dcCb, acCb = hr.transform_quant_chroma8(oCb, cpb[cmode], qpc)
            dcCr, acCr = hr.transform_quant_chroma8(oCr, cpr[cmode], qpc)
            if any(a.any() for a in acCb) or any(a.any() for a in acCr):
                cbp_chroma = 2
            elif dcCb.any() or dcCr.any():
                cbp_chroma = 1
            else:
                cbp_chroma = 0
            rY = hr.recon_luma16(lpred, dcL, acL if cbp_luma else None, qp)
            rCb = hr.recon_chroma8(
                cpb[cmode], dcCb if cbp_chroma else np.zeros((2, 2), np.int64),
                acCb if cbp_chroma == 2 else None, qpc)
            rCr = hr.recon_chroma8(
                cpr[cmode], dcCr if cbp_chroma else np.zeros((2, 2), np.int64),
                acCr if cbp_chroma == 2 else None, qpc)
            rlmad = float(np.abs(oY.astype(np.int64)
                                 - rY.astype(np.int64)).mean())
            rcmad = (float(np.abs(oCb.astype(np.int64)
                                  - rCb.astype(np.int64)).mean())
                     + float(np.abs(oCr.astype(np.int64)
                                    - rCr.astype(np.int64)).mean())) / 2.0
            # Intra_4x4 trial: detailed MBs beat one 16x16 prediction.
            # Mode decision is RATE-aware (JM-style J = SSD + lambda*R
            # with lambda_mode = 0.85 * 2^((qp-12)/3) and R approximated
            # by nonzero-coefficient and mode-signalling counts):
            # distortion alone almost never separates the candidates,
            # because residual coding can patch either prediction — the
            # difference is how many bits that takes.
            modes4, blocks4, rY4, mad4 = _try_i4_mb(
                oY, recY, yx, yy, decoded, i4modes, qp) \
                if pcm_mad >= 0 else (None, None, None, float("inf"))
            lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
            ssd16 = float(((oY.astype(np.int64)
                            - rY.astype(np.int64)) ** 2).sum())
            nnz16 = int(np.count_nonzero(dcL)) + sum(
                int(np.count_nonzero(a)) for a in acL)
            j16 = ssd16 + lam * (8 + 6 * nnz16)
            if modes4 is not None:
                ssd4 = float(((oY.astype(np.int64)
                               - rY4.astype(np.int64)) ** 2).sum())
                nnz4 = sum(int(np.count_nonzero(b)) for b in blocks4)
                j4 = ssd4 + lam * (4 * 16 + 6 * nnz4)
            else:
                j4 = float("inf")
            use_i4 = j4 < j16
            best_lmad = mad4 if use_i4 else rlmad
            bx0, by0 = mbx * 4, mby * 4
            if max(best_lmad, rcmad) <= pcm_mad:
                if use_i4:
                    w.ue(0)          # mb_type: I_4x4 (I_NxN)
                    mloc = i4modes   # parse-order mpm state (8.3.1.1)
                    for blk, (ox, oy) in enumerate(hr.LUMA_BLOCK_ORDER):
                        bx, by = bx0 + ox, by0 + oy
                        mpm = _most_probable_i4_mode(mloc, bx, by)
                        m = modes4[blk]
                        if m == mpm:
                            w.u(1, 1)    # prev_intra4x4_pred_mode_flag
                        else:
                            w.u(0, 1)
                            w.u(m if m < mpm else m - 1, 3)
                        mloc[by, bx] = m
                    w.ue(cmode)
                    cbp_luma4 = 0
                    for i8 in range(4):
                        if any(blocks4[i8 * 4 + i4].any()
                               for i4 in range(4)):
                            cbp_luma4 |= 1 << i8
                    cbp = cbp_luma4 | (cbp_chroma << 4)
                    w.ue(_CBP_INTRA_INV[cbp])
                    if cbp:
                        w.se(0)          # mb_qp_delta
                        _write_i4_luma_residual(w, ctx, mbx, mby,
                                                blocks4, cbp_luma4)
                        _write_chroma_residual(w, ctx, mbx, mby, dcCb,
                                               acCb, dcCr, acCr,
                                               cbp_chroma)
                    recY[yy:yy + 16, yx:yx + 16] = rY4
                else:
                    # Intra_16x16 (Table 7-11): 1+pm+4*cbpC+12*[cbpL]
                    w.ue(1 + lmode + 4 * cbp_chroma
                         + (12 if cbp_luma else 0))
                    w.ue(cmode)          # intra_chroma_pred_mode
                    w.se(0)              # mb_qp_delta (constant QP slice)
                    _write_i16_residual(w, ctx, mbx, mby, dcL, acL,
                                        cbp_luma, dcCb, acCb, dcCr, acCr,
                                        cbp_chroma)
                    i4modes[by0:by0 + 4, bx0:bx0 + 4] = -1
                    recY[yy:yy + 16, yx:yx + 16] = rY
                recCb[cy:cy + 8, cx:cx + 8] = rCb
                recCr[cy:cy + 8, cx:cx + 8] = rCr
            else:
                w.ue(25)                 # I_PCM
                w.align()                # pcm_alignment_zero_bit
                w.bytes_(oY.tobytes())
                w.bytes_(oCb.tobytes())
                w.bytes_(oCr.tobytes())
                ctx.mark_pcm(mbx, mby)
                recY[yy:yy + 16, yx:yx + 16] = oY
                recCb[cy:cy + 8, cx:cx + 8] = oCb
                recCr[cy:cy + 8, cx:cx + 8] = oCr
            decoded[by0:by0 + 4, bx0:bx0 + 4] = True
    # rbsp() appends the stop bit (rbsp_slice_trailing_bits) and applies
    # emulation prevention over the whole slice — headers AND PCM bytes
    return bytes([0x65]) + w.rbsp()


def _try_i16_in_p(oY, oCb, oCr, recY, recCb, recCr, yx, yy, cx, cy,
                  qp: int, qpc: int) -> dict | None:
    """Build the Intra_16x16 candidate for one MB of a P slice: best
    available predictions, quantized residual, reconstruction, recon
    MAD and the J = SSD + lambda*R cost.  None when no luma prediction
    is available (cannot happen for in-picture MBs — DC always is)."""
    oY64 = oY.astype(np.int64)
    lp = _pred_luma16(recY, yx, yy)
    if not lp:
        return None
    lmode, lpred, _ = min(
        ((m, p, float(np.abs(oY64 - p.astype(np.int64)).mean()))
         for m, p in lp.items()), key=lambda t: (t[2], t[0]))
    cpb = _pred_chroma8(recCb, cx, cy)
    cpr = _pred_chroma8(recCr, cx, cy)
    cmode = min(cpb, key=lambda m: (
        float(np.abs(oCb.astype(np.int64)
                     - cpb[m].astype(np.int64)).mean())
        + float(np.abs(oCr.astype(np.int64)
                       - cpr[m].astype(np.int64)).mean()), m))
    dcL, acL = hr.transform_quant_luma16(oY, lpred, qp)
    cbp_l = 15 if any(a.any() for a in acL) else 0
    dcCb, acCb = hr.transform_quant_chroma8(oCb, cpb[cmode], qpc)
    dcCr, acCr = hr.transform_quant_chroma8(oCr, cpr[cmode], qpc)
    if any(a.any() for a in acCb) or any(a.any() for a in acCr):
        cbp_c = 2
    elif dcCb.any() or dcCr.any():
        cbp_c = 1
    else:
        cbp_c = 0
    rY = hr.recon_luma16(lpred, dcL, acL if cbp_l else None, qp)
    rCb = hr.recon_chroma8(
        cpb[cmode], dcCb if cbp_c else np.zeros((2, 2), np.int64),
        acCb if cbp_c == 2 else None, qpc)
    rCr = hr.recon_chroma8(
        cpr[cmode], dcCr if cbp_c else np.zeros((2, 2), np.int64),
        acCr if cbp_c == 2 else None, qpc)
    mad = max(
        float(np.abs(oY64 - rY.astype(np.int64)).mean()),
        (float(np.abs(oCb.astype(np.int64) - rCb.astype(np.int64)).mean())
         + float(np.abs(oCr.astype(np.int64)
                        - rCr.astype(np.int64)).mean())) / 2.0)
    lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
    nnz = int(np.count_nonzero(dcL)) \
        + sum(int(np.count_nonzero(a)) for a in acL) \
        + int(np.count_nonzero(dcCb)) + int(np.count_nonzero(dcCr)) \
        + sum(int(np.count_nonzero(a)) for a in acCb) \
        + sum(int(np.count_nonzero(a)) for a in acCr)
    j = float(((oY64 - rY.astype(np.int64)) ** 2).sum()) \
        + lam * (12 + 6 * nnz)
    return {"lmode": lmode, "cmode": cmode, "cbp_l": cbp_l,
            "cbp_c": cbp_c, "dcL": dcL, "acL": acL, "dcCb": dcCb,
            "acCb": acCb, "dcCr": dcCr, "acCr": acCr, "rY": rY,
            "rCb": rCb, "rCr": rCr, "mad": mad, "j": j}


def _emit_i16_in_p(w: _BitWriter, ctx: _CoeffCtx, mbx: int, mby: int,
                   cand: dict, offset: int = 5) -> None:
    """Write one Intra_16x16 MB inside a P slice (Table 7-13: the
    I-slice mb_type shifted by 5) or a B slice (offset 23,
    Table 7-14)."""
    w.ue(offset + 1 + cand["lmode"] + 4 * cand["cbp_c"]
         + (12 if cand["cbp_l"] else 0))
    w.ue(cand["cmode"])
    w.se(0)  # mb_qp_delta
    _write_i16_residual(w, ctx, mbx, mby, cand["dcL"], cand["acL"],
                        cand["cbp_l"], cand["dcCb"], cand["acCb"],
                        cand["dcCr"], cand["acCr"], cand["cbp_c"])


def encode_pframe(rgb: np.ndarray,
                  ref,
                  qp: int = 26, pcm_mad: float = 4.0, frame_num: int = 1,
                  search: int = 8, poc: int | None = None,
                  weighted=None) -> bytes:
    """Encode one RGB frame as a P slice NAL (header byte 0x61) against
    ``ref`` — the UNCROPPED reconstructed planes of the previous frame,
    or a LIST of such plane tuples (reference list L0, index 0 = most
    recent) for multi-reference prediction (use :func:`encode_gop` to
    thread them automatically).

    Per MB, in candidate order: P_Skip / inter partitions with a
    two-stage motion search per partition per reference (+-``search``
    integer positions around the rounded median predictor, then half-
    and quarter-sample refinement rings around the winner; SAD + ref-bit
    objective, P_Skip emitted when the 16x16 shape picks refidx 0, the
    8.4.1.1 inference vector, and every quantized coefficient is zero);
    Intra_16x16 fallback when motion compensation misses ``pcm_mad``;
    lossless I_PCM as the last resort.  Intra_4x4 inside P slices is
    decoder-only.  The encoder reconstructs through the decoder's own
    functions, so decode keeps the bit-identity contract.

    ``weighted``: explicit weighted prediction (spec 8.4.2.3.2 — the
    fade tool).  ``"auto"`` least-squares-fits a per-reference luma
    (weight, offset) at denom 2^5 plus chroma mean offsets;
    or pass ``(luma_log2_denom, chroma_log2_denom, [per-ref
    (lw, lo, cwb, cob, cwr, cor)])`` explicitly.  The stream then
    carries a pred_weight_table and MUST be decoded with a PPS whose
    weighted_pred_flag is set (mp4.encode_pps(weighted_pred=True))."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_pframe expects (h, w, 3) RGB")
    if not 0 <= qp <= 51:
        raise ValueError(f"qp must be in [0, 51], got {qp}")
    Y, Cb, Cr = rgb_to_yuv420(rgb)
    Y, Cb, Cr = _pad_mb(Y, 16), _pad_mb(Cb, 8), _pad_mb(Cr, 8)
    refs = [ref] if isinstance(ref[0], np.ndarray) else list(ref)
    for rY, _rCb, _rCr in refs:
        if rY.shape != Y.shape:
            raise ValueError(
                f"reference luma {rY.shape} != frame luma {Y.shape}")
    n_refs = len(refs)
    mbs_h, mbs_w = Y.shape[0] // 16, Y.shape[1] // 16
    recY = np.zeros_like(Y)
    recCb = np.zeros_like(Cb)
    recCr = np.zeros_like(Cr)
    ctx = _CoeffCtx(mbs_w, mbs_h)
    decoded = np.zeros((mbs_h * 4, mbs_w * 4), dtype=bool)
    i4modes = np.full((mbs_h * 4, mbs_w * 4), -1, dtype=np.int8)
    mvs4 = np.zeros((mbs_h * 4, mbs_w * 4, 2), dtype=np.int32)
    ref4 = np.full((mbs_h * 4, mbs_w * 4), -1, dtype=np.int8)
    qpc = hr.chroma_qp(qp, 0)
    refY64s = [r[0].astype(np.int64) for r in refs]

    def _ref_bits(ri: int) -> int:
        """te(v) bit cost of ref_idx_l0 (9.1: 1 bit when 2 refs are
        active, ue(v) otherwise; absent with a single reference)."""
        if n_refs == 1:
            return 0
        if n_refs == 2:
            return 1
        return 2 * int(ri + 1).bit_length() - 1

    if weighted == "auto":
        # least-squares luma fade fit per reference: a = cov/var,
        # b = mean residual; chroma rides on mean offsets
        wl = []
        Yf = Y.astype(np.float64)
        for rY_, rCb_, rCr_ in refs:
            rf = rY_.astype(np.float64)
            var = float(rf.var())
            a = (float(((Yf - Yf.mean()) * (rf - rf.mean())).mean())
                 / var if var > 1e-9 else 1.0)
            lw = int(np.clip(round(a * 32), -127, 127))
            lo = int(np.clip(round(float(Yf.mean())
                                   - lw * float(rf.mean()) / 32.0),
                             -127, 127))
            cob = int(np.clip(round(float(Cb.mean())
                                    - float(rCb_.astype(np.float64)
                                            .mean())), -127, 127))
            cor = int(np.clip(round(float(Cr.mean())
                                    - float(rCr_.astype(np.float64)
                                            .mean())), -127, 127))
            wl.append((lw, lo, 32, cob, 32, cor))
        weighted = (5, 5, wl)
    if weighted is not None:
        if len(weighted[2]) != n_refs:
            raise ValueError(
                f"weighted needs one entry per reference "
                f"({n_refs}), got {len(weighted[2])}")

    def _wle(p, ri):
        """Weight a luma prediction for reference ``ri`` (encoder side;
        no-op without weights)."""
        if weighted is None:
            return p
        return _wp_apply(p, weighted[2][ri][0], weighted[2][ri][1],
                         weighted[0])

    def _wce(p, ri, comp):
        if weighted is None:
            return p
        w_, o_ = (weighted[2][ri][2 + 2 * comp],
                  weighted[2][ri][3 + 2 * comp])
        return _wp_apply(p, w_, o_, weighted[1])

    w = _BitWriter()
    w.ue(0)                      # first_mb_in_slice
    w.ue(5)                      # slice_type: P (all slices)
    w.ue(0)                      # pic_parameter_set_id
    w.u(frame_num % 256, 8)      # frame_num
    # pic_order_cnt_lsb: DISPLAY order (decouples from frame_num once
    # B pictures reorder the stream; defaults to 2*frame_num for the
    # classic all-P GOP)
    w.u((2 * frame_num if poc is None else poc) % 256, 8)
    if n_refs > 1:
        w.u(1, 1)                # num_ref_idx_active_override_flag
        w.ue(n_refs - 1)         # num_ref_idx_l0_active_minus1
    else:
        w.u(0, 1)                # num_ref_idx_active_override_flag
    w.u(0, 1)                    # ref_pic_list_modification_flag_l0
    if weighted is not None:     # pred_weight_table (7.3.5.4)
        ld, cd, wl = weighted
        w.ue(ld)
        w.ue(cd)
        for lw, lo, cwb, cob, cwr, cor in wl:
            if lw == 1 << ld and lo == 0:
                w.u(0, 1)        # luma_weight_l0_flag
            else:
                w.u(1, 1)
                w.se(lw)
                w.se(lo)
            if (cwb == 1 << cd and cob == 0
                    and cwr == 1 << cd and cor == 0):
                w.u(0, 1)        # chroma_weight_l0_flag
            else:
                w.u(1, 1)
                w.se(cwb)
                w.se(cob)
                w.se(cwr)
                w.se(cor)
    w.u(0, 1)                    # adaptive_ref_pic_marking_mode_flag
    w.se(qp - 26)                # slice_qp_delta
    w.ue(1)                      # disable_deblocking_filter_idc

    pending_skip = 0
    for mby in range(mbs_h):
        for mbx in range(mbs_w):
            yx, yy = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            bx0, by0 = mbx * 4, mby * 4
            oY = Y[yy:yy + 16, yx:yx + 16]
            oCb = Cb[cy:cy + 8, cx:cx + 8]
            oCr = Cr[cy:cy + 8, cx:cx + 8]
            skipmv = _skip_mv(mvs4, ref4, decoded, mbx, mby)
            oY64 = oY.astype(np.int64)
            lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)

            def _search_part(px, py, bw_, bh_, centers, radius, ref64,
                             ri=0, first=()):
                """Integer exhaustive search around each center, then
                half- and quarter-sample refinement rings around the
                winner (the classic two-stage fractional search), against
                one reference picture.  The ``first`` candidates (the
                exact, possibly fractional, skip inference) are evaluated
                before everything else so strict '<' comparisons keep
                P_Skip reachable on ties."""
                o = Y[py:py + bh_, px:px + bw_].astype(np.int64)
                best_l, seen = None, set()
                cands = list(first) + [(0, 0)]
                for ccx, ccy in centers:
                    cands += [(4 * (ccx + dx), 4 * (ccy + dy))
                              for dy in range(-radius, radius + 1)
                              for dx in range(-radius, radius + 1)]

                def _sad(q):
                    return int(np.abs(
                        o - _wle(_mc_luma(ref64, px, py, q, (bh_, bw_)),
                                 ri).astype(np.int64)).sum())

                for q in cands:
                    if q in seen:
                        continue
                    seen.add(q)
                    sad = _sad(q)
                    if best_l is None or sad < best_l[0]:
                        best_l = (sad, q)
                for step in (2, 1):
                    qx, qy = best_l[1]
                    for dy in (-step, 0, step):
                        for dx in (-step, 0, step):
                            q = (qx + dx, qy + dy)
                            if q in seen:
                                continue
                            seen.add(q)
                            sad = _sad(q)
                            if sad < best_l[0]:
                                best_l = (sad, q)
                return best_l[1], best_l[0]

            # SAD-domain motion lambda for the per-quadrant sub-shape
            # decision (the classic lambda_motion ~ sqrt(lambda_mode));
            # rate counted as mvd magnitudes + per-shape header bits
            lam_s = 0.92 * 2.0 ** ((qp - 12) / 6.0)
            _SUB_HEAD = {0: 1, 1: 3, 2: 3, 3: 5}  # ue bits of sub_mb_type

            def _trial(shape, best16=None):
                """Search one partitioning.  Partitions are predicted
                and committed SEQUENTIALLY into scratch grids, because
                the next partition's predictor reads the previous ones'
                mvs and refidxs (exactly what the decoder will
                reconstruct).  Each partition also picks its reference
                picture (SAD + te(v) ref bits); for P_8x8 the quadrant's
                reference is chosen by the 8x8-shape search and the
                finer sub_mb_types (8x4 / 4x8 / 4x4) are then weighed on
                that reference by SAD + lambda*mvd-rate over a
                quadrant-local scratch before committing."""
                mbt, plist0 = _P_SHAPES[shape]
                t_mvs, t_ref = mvs4.copy(), ref4.copy()
                t_dec = decoded.copy()
                predY = np.empty((16, 16), dtype=np.uint8)
                predCb = np.empty((8, 8), dtype=np.uint8)
                predCr = np.empty((8, 8), dtype=np.uint8)
                mv_list, mvd_list, ri_list, plist = [], [], [], []
                sub_types = None

                def _do_part(tag, ox, oy, wb, hb, grids, fixed_ref=None):
                    """Search one partition (over references unless
                    ``fixed_ref`` pins one) against ``grids`` and commit
                    its (mv, refidx) there; returns (mv, mvd, ri, cost)
                    where cost folds the te(v) ref bits into the SAD."""
                    g_mvs, g_ref, g_dec = grids
                    bx, by = bx0 + ox, by0 + oy
                    px, py = yx + ox * 4, yy + oy * 4
                    ref_cands = ([fixed_ref] if fixed_ref is not None
                                 else range(n_refs))
                    best_r = None
                    for ri in ref_cands:
                        mvp_p = _mv_pred(g_mvs, g_ref, g_dec, bx, by, wb,
                                         part=tag, refidx=ri)
                        c0 = ((mvp_p[0] + 2) >> 2, (mvp_p[1] + 2) >> 2)
                        if shape == "16x16":
                            mv_p, sad = _search_part(
                                px, py, 16, 16, [c0], search, refY64s[ri],
                                ri, first=[skipmv] if ri == 0 else ())
                        else:
                            # sub-partition searches center on the
                            # partition's own predictor, the 16x16
                            # winner, AND the origin (motion can OPPOSE
                            # the predictor — e.g. shearing halves at a
                            # picture corner where the only neighbor
                            # predicts the other half's vector), with a
                            # small radius — the full-radius evidence
                            # already lives in the 16x16 trial
                            centers = [c0,
                                       (best16[0] >> 2, best16[1] >> 2),
                                       (0, 0)]
                            mv_p, sad = _search_part(
                                px, py, wb * 4, hb * 4, centers, 3,
                                refY64s[ri], ri)
                        cost = sad + lam_s * _ref_bits(ri)
                        if best_r is None or cost < best_r[0]:
                            best_r = (cost, mv_p, mvp_p, ri)
                    cost, mv_p, mvp_p, ri = best_r
                    g_mvs[by:by + hb, bx:bx + wb] = mv_p
                    g_ref[by:by + hb, bx:bx + wb] = ri
                    g_dec[by:by + hb, bx:bx + wb] = True
                    return mv_p, (mv_p[0] - mvp_p[0],
                                  mv_p[1] - mvp_p[1]), ri, cost

                def _commit(tag, ox, oy, wb, hb, mv_p, mvd, ri):
                    rY_, rCb_, rCr_ = refs[ri]
                    predY[oy * 4:oy * 4 + hb * 4, ox * 4:ox * 4 + wb * 4] \
                        = _wle(_mc_luma(rY_, yx + ox * 4, yy + oy * 4,
                                        mv_p, (hb * 4, wb * 4)), ri)
                    predCb[oy * 2:oy * 2 + hb * 2, ox * 2:ox * 2 + wb * 2] \
                        = _wce(_mc_chroma(rCb_, cx + ox * 2, cy + oy * 2,
                                          mv_p, (hb * 2, wb * 2)), ri, 0)
                    predCr[oy * 2:oy * 2 + hb * 2, ox * 2:ox * 2 + wb * 2] \
                        = _wce(_mc_chroma(rCr_, cx + ox * 2, cy + oy * 2,
                                          mv_p, (hb * 2, wb * 2)), ri, 1)
                    bx, by = bx0 + ox, by0 + oy
                    t_mvs[by:by + hb, bx:bx + wb] = mv_p
                    t_ref[by:by + hb, bx:bx + wb] = ri
                    t_dec[by:by + hb, bx:bx + wb] = True
                    mv_list.append(mv_p)
                    mvd_list.append(mvd)
                    ri_list.append(ri)
                    plist.append((tag, ox, oy, wb, hb))

                quad_refs = None
                if shape == "8x8":
                    sub_types, quad_refs = [], []
                    for qox, qoy in _QUADRANTS:
                        best_q, qref = None, None
                        for smt in (0, 1, 2, 3):
                            q_grids = (t_mvs.copy(), t_ref.copy(),
                                       t_dec.copy())
                            tot_cost, rate, recs = 0.0, _SUB_HEAD[smt], []
                            for sox, soy, swb, shb in _SUB_SHAPES[smt]:
                                ox, oy = qox + sox, qoy + soy
                                mv_p, mvd, ri, cost = _do_part(
                                    None, ox, oy, swb, shb, q_grids,
                                    fixed_ref=qref)
                                tot_cost += cost
                                rate += 2 + abs(mvd[0]) + abs(mvd[1])
                                recs.append((ox, oy, swb, shb, mv_p,
                                             mvd, ri))
                            if smt == 0:
                                # the 8x8-shape search picks the
                                # quadrant's reference; finer shapes
                                # share it (ref_idx is per 8x8 in the
                                # syntax)
                                qref = recs[0][6]
                            cost = tot_cost + lam_s * rate
                            if best_q is None or cost < best_q[0]:
                                best_q = (cost, smt, recs)
                            # an already well-matched 8x8 quadrant will
                            # not buy back finer vectors' bits: skip
                            # them.  The bar scales with the SAD-domain
                            # lambda so low-qp (near-lossless) encodes
                            # keep hunting for the exact vectors while
                            # mid-qp encodes drop the 3x trial cost.
                            if smt == 0 and tot_cost <= 48 * lam_s:
                                break
                        sub_types.append(best_q[1])
                        quad_refs.append(best_q[2][0][6])
                        for ox, oy, swb, shb, mv_p, mvd, ri in best_q[2]:
                            _commit(None, ox, oy, swb, shb, mv_p, mvd, ri)
                else:
                    for tag, ox, oy, wb, hb in plist0:
                        mv_p, mvd, ri, _cost_p = _do_part(
                            tag, ox, oy, wb, hb, (t_mvs, t_ref, t_dec))
                        # _do_part committed the grids; _commit rewrites
                        # the same values and fills the prediction
                        # planes and lists
                        _commit(tag, ox, oy, wb, hb, mv_p, mvd, ri)
                return {"shape": shape, "mb_type": mbt, "plist": plist,
                        "sub_types": sub_types, "mvs": mv_list,
                        "mvds": mvd_list, "ris": ri_list,
                        "quad_refs": quad_refs, "predY": predY,
                        "predCb": predCb, "predCr": predCr}

            def _cost(tr):
                """Residual-code the trial's composite prediction and
                attach recon + J (SSD + lambda * approximate rate: mvd
                magnitudes, nnz coefficients, per-shape header cost)."""
                predY64 = tr["predY"].astype(np.int64)
                blocks4 = []
                for blk, (ox, oy) in enumerate(hr.LUMA_BLOCK_ORDER):
                    res = oY64[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4] \
                        - predY64[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4]
                    blocks4.append(hr.mat_to_scan(
                        hr.quant4x4(hr.fwd4x4(res), qp)))
                cbp_luma4 = 0
                for i8 in range(4):
                    if any(blocks4[i8 * 4 + i4].any() for i4 in range(4)):
                        cbp_luma4 |= 1 << i8
                dcCb, acCb = hr.transform_quant_chroma8(
                    oCb, tr["predCb"], qpc)
                dcCr, acCr = hr.transform_quant_chroma8(
                    oCr, tr["predCr"], qpc)
                if any(a.any() for a in acCb) or any(a.any() for a in acCr):
                    cbp_chroma = 2
                elif dcCb.any() or dcCr.any():
                    cbp_chroma = 1
                else:
                    cbp_chroma = 0
                zero_l = [np.zeros(16, dtype=np.int64)] * 16
                rY = _recon_luma_blocks4(
                    tr["predY"], blocks4 if cbp_luma4 else zero_l, qp)
                rCb = hr.recon_chroma8(
                    tr["predCb"],
                    dcCb if cbp_chroma else np.zeros((2, 2), np.int64),
                    acCb if cbp_chroma == 2 else None, qpc)
                rCr = hr.recon_chroma8(
                    tr["predCr"],
                    dcCr if cbp_chroma else np.zeros((2, 2), np.int64),
                    acCr if cbp_chroma == 2 else None, qpc)
                imad = max(
                    float(np.abs(oY64 - rY.astype(np.int64)).mean()),
                    (float(np.abs(oCb.astype(np.int64)
                                  - rCb.astype(np.int64)).mean())
                     + float(np.abs(oCr.astype(np.int64)
                                    - rCr.astype(np.int64)).mean())) / 2.0)
                nnz = sum(int(np.count_nonzero(b)) for b in blocks4) \
                    + int(np.count_nonzero(dcCb)) \
                    + int(np.count_nonzero(dcCr)) \
                    + sum(int(np.count_nonzero(a)) for a in acCb) \
                    + sum(int(np.count_nonzero(a)) for a in acCr)
                ssd = float(((oY64 - rY.astype(np.int64)) ** 2).sum())
                mv_rate = sum(abs(dx) + abs(dy) for dx, dy in tr["mvds"])
                if tr["shape"] == "8x8":
                    head = 12 + sum(_SUB_HEAD[s] for s in tr["sub_types"]) \
                        + 2 * len(tr["mvds"]) \
                        + sum(_ref_bits(ri) for ri in tr["quad_refs"])
                else:
                    head = {"16x16": 10, "16x8": 14,
                            "8x16": 14}[tr["shape"]] \
                        + sum(_ref_bits(ri) for ri in tr["ris"])
                tr.update(blocks4=blocks4, cbp_luma4=cbp_luma4,
                          cbp=cbp_luma4 | (cbp_chroma << 4),
                          cbp_chroma=cbp_chroma, dcCb=dcCb, acCb=acCb,
                          dcCr=dcCr, acCr=acCr, rY=rY, rCb=rCb, rCr=rCr,
                          imad=imad,
                          j=ssd + lam * (head + mv_rate + 6 * nnz))
                return tr

            t16 = _cost(_trial("16x16"))
            bt = t16
            # a clean skip needs no other trials; otherwise weigh the
            # sub-partitionings (their finer vectors must BUY their extra
            # mvd/header bits through the shared J)
            if not (t16["mvs"][0] == skipmv and t16["ris"][0] == 0
                    and t16["cbp"] == 0):
                for shape in ("16x8", "8x16", "8x8"):
                    tr = _cost(_trial(shape, best16=t16["mvs"][0]))
                    if tr["j"] < bt["j"]:
                        bt = tr
            # rate-aware inter-vs-intra choice (same J = SSD + lambda*R
            # shape as the I-slice mode decision): across a scene cut
            # motion compensation can still PATCH any MB with a huge
            # residual, so distortion alone would never pick intra —
            # the bit cost is what separates them
            i16 = _try_i16_in_p(oY, oCb, oCr, recY, recCb, recCr,
                                yx, yy, cx, cy, qp, qpc)
            if i16 is not None and pcm_mad >= 0 \
                    and i16["j"] < bt["j"] and i16["mad"] <= pcm_mad:
                w.ue(pending_skip)
                pending_skip = 0
                _emit_i16_in_p(w, ctx, mbx, mby, i16)
                recY[yy:yy + 16, yx:yx + 16] = i16["rY"]
                recCb[cy:cy + 8, cx:cx + 8] = i16["rCb"]
                recCr[cy:cy + 8, cx:cx + 8] = i16["rCr"]
                decoded[by0:by0 + 4, bx0:bx0 + 4] = True
                continue
            if pcm_mad >= 0 and bt["imad"] <= pcm_mad:
                if bt["shape"] == "16x16" and bt["mvs"][0] == skipmv \
                        and bt["ris"][0] == 0 and bt["cbp"] == 0:
                    pending_skip += 1        # P_Skip
                else:
                    w.ue(pending_skip)       # mb_skip_run
                    pending_skip = 0
                    w.ue(bt["mb_type"])      # Table 7-13 partitioning
                    if bt["shape"] == "8x8":
                        for smt in bt["sub_types"]:
                            w.ue(smt)        # sub_mb_type (Table 7-14)
                    if n_refs > 1:
                        # ref_idx_l0, te(v): per partition, or per 8x8
                        # quadrant for P_8x8 (7.3.5.1 / 7.3.5.2)
                        for ri in (bt["quad_refs"]
                                   if bt["shape"] == "8x8"
                                   else bt["ris"]):
                            if n_refs == 2:
                                w.u(1 - ri, 1)
                            else:
                                w.ue(ri)
                    for dx, dy in bt["mvds"]:
                        w.se(dx)             # mvd_l0 per partition
                        w.se(dy)
                    w.ue(_CBP_INTER_INV[bt["cbp"]])
                    if bt["cbp"]:
                        w.se(0)              # mb_qp_delta
                        _write_i4_luma_residual(w, ctx, mbx, mby,
                                                bt["blocks4"],
                                                bt["cbp_luma4"])
                        _write_chroma_residual(w, ctx, mbx, mby,
                                               bt["dcCb"], bt["acCb"],
                                               bt["dcCr"], bt["acCr"],
                                               bt["cbp_chroma"])
                recY[yy:yy + 16, yx:yx + 16] = bt["rY"]
                recCb[cy:cy + 8, cx:cx + 8] = bt["rCb"]
                recCr[cy:cy + 8, cx:cx + 8] = bt["rCr"]
                for (tag, ox, oy, wb, hb), mv_p, ri in zip(
                        bt["plist"], bt["mvs"], bt["ris"]):
                    mvs4[by0 + oy:by0 + oy + hb,
                         bx0 + ox:bx0 + ox + wb] = mv_p
                    ref4[by0 + oy:by0 + oy + hb,
                         bx0 + ox:bx0 + ox + wb] = ri
                decoded[by0:by0 + 4, bx0:bx0 + 4] = True
                continue
            # Intra_16x16 fallback inside the P slice (motion missed)
            i16f = _try_i16_in_p(oY, oCb, oCr, recY, recCb, recCr,
                                 yx, yy, cx, cy, qp, qpc)
            w.ue(pending_skip)
            pending_skip = 0
            if i16f is not None and pcm_mad >= 0 \
                    and i16f["mad"] <= pcm_mad:
                _emit_i16_in_p(w, ctx, mbx, mby, i16f)
                recY[yy:yy + 16, yx:yx + 16] = i16f["rY"]
                recCb[cy:cy + 8, cx:cx + 8] = i16f["rCb"]
                recCr[cy:cy + 8, cx:cx + 8] = i16f["rCr"]
            else:
                w.ue(30)                     # I_PCM in a P slice
                w.align()
                w.bytes_(oY.tobytes())
                w.bytes_(oCb.tobytes())
                w.bytes_(oCr.tobytes())
                ctx.mark_pcm(mbx, mby)
                recY[yy:yy + 16, yx:yx + 16] = oY
                recCb[cy:cy + 8, cx:cx + 8] = oCb
                recCr[cy:cy + 8, cx:cx + 8] = oCr
            decoded[by0:by0 + 4, bx0:bx0 + 4] = True
    if pending_skip:
        w.ue(pending_skip)  # trailing skipped MBs close the slice
    return bytes([0x61]) + w.rbsp()


def encode_gop(frames, qp: int = 26, pcm_mad: float = 4.0,
               search: int = 8, n_refs: int = 1,
               weighted=None) -> list[bytes]:
    """Encode frames as an IDR-led GOP: frame 0 via encode_iframe, the
    rest as P slices, threading each frame's DECODED reconstruction
    through a sliding-window DPB of the last ``n_refs`` pictures
    (reference list L0, most recent first — the decoder's planes ARE
    the encoder's by the bit-identity contract, so this doubles as a
    self-check).  Needs the matching SPS/PPS fixed choices
    (mp4.encode_sps(..., max_num_ref_frames=n_refs) / encode_pps(True))
    only at decode time — the reference here is reconstructed with a
    synthetic uncropped geometry."""
    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    if n_refs < 1:
        raise ValueError("n_refs must be >= 1")
    h, w_, _ = frames[0].shape
    from .mp4 import encode_pps, encode_sps, parse_pps, parse_sps
    sps = parse_sps(encode_sps(w_, h, fps=10.0,
                               max_num_ref_frames=n_refs))
    pps = parse_pps(encode_pps(deblocking_control=True,
                               weighted_pred=weighted is not None))
    out = [encode_iframe(frames[0], pcm_mad=pcm_mad, qp=qp)]
    dpb = [_decode_slice(out[0], sps, pps, None)]
    for i, fr in enumerate(frames[1:], start=1):
        nal = encode_pframe(fr, dpb, qp=qp, pcm_mad=pcm_mad,
                            frame_num=i, search=search,
                            weighted=weighted)
        out.append(nal)
        dpb.insert(0, _decode_slice(nal, sps, pps, dpb))
        del dpb[n_refs:]
    return out


def encode_bframe(rgb: np.ndarray,
                  ref_l0: tuple[np.ndarray, np.ndarray, np.ndarray],
                  ref_l1: tuple[np.ndarray, np.ndarray, np.ndarray],
                  qp: int = 26, pcm_mad: float = 4.0, frame_num: int = 1,
                  poc: int = 0, search: int = 8) -> bytes:
    """Encode one RGB frame as a non-reference B slice NAL (header byte
    0x01: nal_ref_idc 0) predicting from a past (``ref_l0``) and a
    future (``ref_l1``) reconstructed picture — B_L0_16x16 /
    B_L1_16x16 / B_Bi_16x16 per MB by the shared J decision (default
    biprediction = the (p0+p1+1)>>1 average, weighted_bipred_idc 0),
    with Intra_16x16 / I_PCM fallbacks.  ``poc`` is the DISPLAY index
    (pic_order_cnt_lsb = 2*poc), which for a B picture differs from
    decode order; the decoder rebuilds the same L0/L1 lists from POC.
    Direct/skip modes and sub-16x16 B partitions are the documented
    seam."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_bframe expects (h, w, 3) RGB")
    if not 0 <= qp <= 51:
        raise ValueError(f"qp must be in [0, 51], got {qp}")
    Y, Cb, Cr = rgb_to_yuv420(rgb)
    Y, Cb, Cr = _pad_mb(Y, 16), _pad_mb(Cb, 8), _pad_mb(Cr, 8)
    for rY, _a, _b in (ref_l0, ref_l1):
        if rY.shape != Y.shape:
            raise ValueError(
                f"reference luma {rY.shape} != frame luma {Y.shape}")
    refs = (ref_l0, ref_l1)
    refY64s = [r[0].astype(np.int64) for r in refs]
    mbs_h, mbs_w = Y.shape[0] // 16, Y.shape[1] // 16
    recY, recCb, recCr = (np.zeros_like(Y), np.zeros_like(Cb),
                          np.zeros_like(Cr))
    ctx = _CoeffCtx(mbs_w, mbs_h)
    decoded = np.zeros((mbs_h * 4, mbs_w * 4), dtype=bool)
    mvs4b = [np.zeros((mbs_h * 4, mbs_w * 4, 2), dtype=np.int32)
             for _ in range(2)]
    ref4b = [np.full((mbs_h * 4, mbs_w * 4), -1, dtype=np.int8)
             for _ in range(2)]
    qpc = hr.chroma_qp(qp, 0)
    lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)

    w = _BitWriter()
    w.ue(0)                      # first_mb_in_slice
    w.ue(6)                      # slice_type: B (all slices)
    w.ue(0)                      # pic_parameter_set_id
    w.u(frame_num % 256, 8)      # frame_num
    w.u((2 * poc) % 256, 8)      # pic_order_cnt_lsb (display order)
    w.u(1, 1)                    # direct_spatial_mv_pred_flag
    w.u(0, 1)                    # num_ref_idx_active_override_flag
    w.u(0, 1)                    # ref_pic_list_modification_flag_l0
    w.u(0, 1)                    # ref_pic_list_modification_flag_l1
    # nal_ref_idc == 0: no dec_ref_pic_marking
    w.se(qp - 26)                # slice_qp_delta
    w.ue(1)                      # disable_deblocking_filter_idc

    for mby in range(mbs_h):
        for mbx in range(mbs_w):
            yx, yy = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            bx0, by0 = mbx * 4, mby * 4
            oY = Y[yy:yy + 16, yx:yx + 16]
            oCb = Cb[cy:cy + 8, cx:cx + 8]
            oCr = Cr[cy:cy + 8, cx:cx + 8]
            oY64 = oY.astype(np.int64)

            def _list_best(li):
                """Best 16x16 mv against list ``li``'s reference (the
                same two-stage search the P encoder runs)."""
                mvp = _mv_pred(mvs4b[li], ref4b[li], decoded, bx0, by0, 4)
                c0 = ((mvp[0] + 2) >> 2, (mvp[1] + 2) >> 2)
                best_l, seen = None, set()
                cands = [(0, 0)] + [
                    (4 * (c0[0] + dx), 4 * (c0[1] + dy))
                    for dy in range(-search, search + 1)
                    for dx in range(-search, search + 1)]

                def _sad(q):
                    return int(np.abs(
                        oY64 - _mc_luma(refY64s[li], yx, yy, q)
                        .astype(np.int64)).sum())

                for q in cands:
                    if q in seen:
                        continue
                    seen.add(q)
                    sad = _sad(q)
                    if best_l is None or sad < best_l[0]:
                        best_l = (sad, q)
                for step in (2, 1):
                    qx, qy = best_l[1]
                    for dy in (-step, 0, step):
                        for dx in (-step, 0, step):
                            q = (qx + dx, qy + dy)
                            if q in seen:
                                continue
                            seen.add(q)
                            sad = _sad(q)
                            if sad < best_l[0]:
                                best_l = (sad, q)
                return best_l[1], mvp

            def _mb_pred(li, mv):
                rY_, rCb_, rCr_ = refs[li]
                return (_mc_luma(rY_, yx, yy, mv),
                        _mc_chroma(rCb_, cx, cy, mv),
                        _mc_chroma(rCr_, cx, cy, mv))

            mv0, mvp0 = _list_best(0)
            mv1, mvp1 = _list_best(1)
            p0, p1 = _mb_pred(0, mv0), _mb_pred(1, mv1)

            def _avg(a, b):
                return tuple(
                    ((x.astype(np.int64) + y + 1) >> 1).astype(np.uint8)
                    for x, y in zip(a, b))

            trials = [
                (1, p0, [(0, mv0, mvp0)], 10),            # B_L0_16x16
                (2, p1, [(1, mv1, mvp1)], 10),            # B_L1_16x16
                # B_Bi from the two single-list winners...
                (3, _avg(p0, p1), [(0, mv0, mvp0), (1, mv1, mvp1)], 12),
            ]
            if (mv0, mv1) != (mvp0, mvp1):
                # ...and from the zero-mvd predictor pair: the average
                # can be exact at the predictors even when neither
                # single-list SAD favors them (each list alone sees the
                # OTHER anchor's half of the difference as noise)
                trials.append(
                    (3, _avg(_mb_pred(0, mvp0), _mb_pred(1, mvp1)),
                     [(0, mvp0, mvp0), (1, mvp1, mvp1)], 12))
            best = None
            for mbt, pred, mvrecs, head in trials:
                predY, predCb, predCr = pred
                predY64 = predY.astype(np.int64)
                blocks4 = []
                for blk, (ox, oy) in enumerate(hr.LUMA_BLOCK_ORDER):
                    res = oY64[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4] \
                        - predY64[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4]
                    blocks4.append(hr.mat_to_scan(
                        hr.quant4x4(hr.fwd4x4(res), qp)))
                cbp_luma4 = 0
                for i8 in range(4):
                    if any(blocks4[i8 * 4 + i4].any() for i4 in range(4)):
                        cbp_luma4 |= 1 << i8
                dcCb, acCb = hr.transform_quant_chroma8(oCb, predCb, qpc)
                dcCr, acCr = hr.transform_quant_chroma8(oCr, predCr, qpc)
                if any(a.any() for a in acCb) \
                        or any(a.any() for a in acCr):
                    cbp_chroma = 2
                elif dcCb.any() or dcCr.any():
                    cbp_chroma = 1
                else:
                    cbp_chroma = 0
                zero_l = [np.zeros(16, dtype=np.int64)] * 16
                rY = _recon_luma_blocks4(
                    predY, blocks4 if cbp_luma4 else zero_l, qp)
                rCb = hr.recon_chroma8(
                    predCb,
                    dcCb if cbp_chroma else np.zeros((2, 2), np.int64),
                    acCb if cbp_chroma == 2 else None, qpc)
                rCr = hr.recon_chroma8(
                    predCr,
                    dcCr if cbp_chroma else np.zeros((2, 2), np.int64),
                    acCr if cbp_chroma == 2 else None, qpc)
                imad = max(
                    float(np.abs(oY64 - rY.astype(np.int64)).mean()),
                    (float(np.abs(oCb.astype(np.int64)
                                  - rCb.astype(np.int64)).mean())
                     + float(np.abs(oCr.astype(np.int64)
                                    - rCr.astype(np.int64)).mean())) / 2.0)
                nnz = sum(int(np.count_nonzero(b)) for b in blocks4) \
                    + int(np.count_nonzero(dcCb)) \
                    + int(np.count_nonzero(dcCr)) \
                    + sum(int(np.count_nonzero(a)) for a in acCb) \
                    + sum(int(np.count_nonzero(a)) for a in acCr)
                ssd = float(((oY64 - rY.astype(np.int64)) ** 2).sum())
                mv_rate = sum(abs(mv[0] - mvp[0]) + abs(mv[1] - mvp[1])
                              for _li, mv, mvp in mvrecs)
                j = ssd + lam * (head + mv_rate + 6 * nnz)
                cand = dict(mbt=mbt, mvrecs=mvrecs, blocks4=blocks4,
                            cbp_luma4=cbp_luma4,
                            cbp=cbp_luma4 | (cbp_chroma << 4),
                            cbp_chroma=cbp_chroma, dcCb=dcCb, acCb=acCb,
                            dcCr=dcCr, acCr=acCr, rY=rY, rCb=rCb,
                            rCr=rCr, imad=imad, j=j)
                if best is None or j < best["j"]:
                    best = cand
            i16 = _try_i16_in_p(oY, oCb, oCr, recY, recCb, recCr,
                                yx, yy, cx, cy, qp, qpc)
            use_intra = (i16 is not None and pcm_mad >= 0
                         and i16["j"] < best["j"]
                         and i16["mad"] <= pcm_mad)
            inter_ok = pcm_mad >= 0 and best["imad"] <= pcm_mad
            w.ue(0)  # mb_skip_run (B_Skip never emitted)
            if not use_intra and inter_ok:
                w.ue(best["mbt"])
                for _li, mv, mvp in best["mvrecs"]:
                    w.se(mv[0] - mvp[0])
                    w.se(mv[1] - mvp[1])
                w.ue(_CBP_INTER_INV[best["cbp"]])
                if best["cbp"]:
                    w.se(0)  # mb_qp_delta
                    _write_i4_luma_residual(w, ctx, mbx, mby,
                                            best["blocks4"],
                                            best["cbp_luma4"])
                    _write_chroma_residual(w, ctx, mbx, mby,
                                           best["dcCb"], best["acCb"],
                                           best["dcCr"], best["acCr"],
                                           best["cbp_chroma"])
                recY[yy:yy + 16, yx:yx + 16] = best["rY"]
                recCb[cy:cy + 8, cx:cx + 8] = best["rCb"]
                recCr[cy:cy + 8, cx:cx + 8] = best["rCr"]
                for li, mv, _mvp in best["mvrecs"]:
                    mvs4b[li][by0:by0 + 4, bx0:bx0 + 4] = mv
                    ref4b[li][by0:by0 + 4, bx0:bx0 + 4] = 0
            elif use_intra or (i16 is not None and pcm_mad >= 0
                               and i16["mad"] <= pcm_mad):
                _emit_i16_in_p(w, ctx, mbx, mby, i16, offset=23)
                recY[yy:yy + 16, yx:yx + 16] = i16["rY"]
                recCb[cy:cy + 8, cx:cx + 8] = i16["rCb"]
                recCr[cy:cy + 8, cx:cx + 8] = i16["rCr"]
            else:
                w.ue(23 + 25)                # I_PCM in a B slice
                w.align()
                w.bytes_(oY.tobytes())
                w.bytes_(oCb.tobytes())
                w.bytes_(oCr.tobytes())
                ctx.mark_pcm(mbx, mby)
                recY[yy:yy + 16, yx:yx + 16] = oY
                recCb[cy:cy + 8, cx:cx + 8] = oCb
                recCr[cy:cy + 8, cx:cx + 8] = oCr
            decoded[by0:by0 + 4, bx0:bx0 + 4] = True
    return bytes([0x01]) + w.rbsp()


def encode_gop_b(frames, qp: int = 26, pcm_mad: float = 4.0,
                 search: int = 8) -> list[bytes]:
    """Encode display-order frames as an IDR-led GOP with one
    NON-REFERENCE B picture between consecutive anchors (display
    I0 B1 P2 B3 P4 ...; decode order I0 P2 B1 P4 B3 ...).  Returns the
    DECODE-order NAL list; ``decode_gop`` reorders output back to
    display order via POC.  Each B predicts from the two surrounding
    anchor reconstructions (L0 = past, L1 = future), so the stream's
    SPS must declare max_num_ref_frames >= 2 (decode with
    ``encode_sps(..., max_num_ref_frames=2)``)."""
    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    h, w_, _ = frames[0].shape
    from .mp4 import encode_pps, encode_sps, parse_pps, parse_sps
    sps = parse_sps(encode_sps(w_, h, fps=10.0, max_num_ref_frames=2))
    pps = parse_pps(encode_pps(deblocking_control=True))
    out = [encode_iframe(frames[0], pcm_mad=pcm_mad, qp=qp)]
    prev_rec = _decode_slice(out[0], sps, pps, None)
    fn = 1
    for disp in range(2, len(frames), 2):
        nal = encode_pframe(frames[disp], prev_rec, qp=qp,
                            pcm_mad=pcm_mad, frame_num=fn,
                            search=search, poc=2 * disp)
        out.append(nal)
        rec = _decode_slice(nal, sps, pps, prev_rec)
        out.append(encode_bframe(frames[disp - 1], prev_rec, rec,
                                 qp=qp, pcm_mad=pcm_mad, frame_num=fn,
                                 poc=disp - 1, search=search))
        prev_rec, fn = rec, fn + 1
    if len(frames) % 2 == 0:  # trailing display frame has no future
        disp = len(frames) - 1
        out.append(encode_pframe(frames[disp], prev_rec, qp=qp,
                                 pcm_mad=pcm_mad, frame_num=fn,
                                 search=search, poc=2 * disp))
    return out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_iframe(nal: bytes, sps: dict, pps: dict) -> np.ndarray:
    """Decode one IDR/I slice NAL (subset above) to (h, w, 3) RGB.

    ``sps``/``pps`` are parse_sps/parse_pps dicts.  Features outside the
    subset raise NotImplementedError naming the feature; corrupt streams
    raise ValueError."""
    Y, Cb, Cr = decode_iframe_planes(nal, sps, pps)
    return yuv420_to_rgb(Y, Cb, Cr)


def decode_iframe_planes(nal: bytes, sps: dict, pps: dict,
                         stats: dict | None = None) \
        -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Like decode_iframe but returns the cropped (Y, Cb, Cr) planes —
    the bit-exact decoder output before any colorspace conversion (the
    RGB round trip clips and rounds, so codec-level tests compare
    planes).  Pass ``stats`` (a dict) to receive the macroblock-type
    census: keys ``i4`` / ``i16`` / ``pcm`` (and for P slices ``p16`` /
    ``skip``) are incremented per decoded MB — the check that a coding
    path ACTUALLY engaged comes from the decoded stream itself, not from
    encoder bookkeeping."""
    return _crop_planes(_decode_slice(nal, sps, pps, None, stats), sps)


def decode_pframe_planes(nal: bytes, sps: dict, pps: dict,
                         ref: tuple[np.ndarray, np.ndarray, np.ndarray],
                         stats: dict | None = None) \
        -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one P slice NAL against ``ref`` — the UNCROPPED (Y, Cb,
    Cr) reconstruction of the reference picture (what ``decode_gop``
    threads between frames; motion compensation reaches the padding
    rows SPS cropping would remove).  Returns cropped planes."""
    return _crop_planes(_decode_slice(nal, sps, pps, ref, stats), sps)


def decode_gop(nals: list[bytes], sps: dict, pps: dict,
               stats: dict | None = None) -> list[np.ndarray]:
    """Decode an IDR-led group of pictures (I/P slice NALs, decode
    order) to a list of (h, w, 3) RGB frames, threading each decoded
    picture as the next one's reference."""
    entries = []
    dpb: list = []  # (poc, planes), most recently decoded first
    n_refs = max(1, sps.get("max_num_ref_frames", 1))
    for nal in nals:
        if (nal[0] & 0x1F) == 5:
            dpb.clear()  # IDR resets the reference picture buffer
        st5, poc = _slice_header_peek(nal, sps)
        if st5 == 1:  # B: default lists split around this picture's POC
            l0 = [e[1] for e in sorted((e for e in dpb if e[0] < poc),
                                       key=lambda e: -e[0])]
            l1 = [e[1] for e in sorted((e for e in dpb if e[0] > poc),
                                       key=lambda e: e[0])]
            planes = _decode_slice(nal, sps, pps, (l0, l1), stats)
        else:
            refs = [e[1] for e in dpb]
            planes = _decode_slice(nal, sps, pps, refs or None, stats)
        if (nal[0] >> 5) & 3:  # nal_ref_idc: reference pictures only
            dpb.insert(0, (poc, planes))
            del dpb[n_refs:]
        entries.append((poc, yuv420_to_rgb(*_crop_planes(planes, sps))))
    # DISPLAY order (PicOrderCnt); equals decode order for all-P GOPs
    entries.sort(key=lambda e: e[0])
    return [rgb for _poc, rgb in entries]


def _slice_header_peek(nal: bytes, sps: dict) -> tuple[int, int]:
    """(slice_type %% 5, pic_order_cnt_lsb) from a slice header — the
    two fields decode_gop needs for reference-list construction and
    display-order output, without decoding the slice."""
    r = _BitReader(_unescape_rbsp(nal[1:]))
    r.ue()  # first_mb_in_slice
    st5 = r.ue() % 5
    r.ue()  # pic_parameter_set_id
    r.u(sps["log2_max_frame_num"])  # frame_num
    if (nal[0] & 0x1F) == 5:
        r.ue()  # idr_pic_id
    poc = r.u(sps["log2_max_poc_lsb"]) if sps["poc_type"] == 0 else 0
    return st5, poc


def _crop_planes(planes, sps: dict):
    recY, recCb, recCr = planes
    h, w = sps["height"], sps["width"]
    crop_l, _, crop_t, _ = sps.get("crop", (0, 0, 0, 0))
    x0, y0 = 2 * crop_l, 2 * crop_t  # 4:2:0 crop units -> luma samples
    return (recY[y0:y0 + h, x0:x0 + w],
            recCb[y0 // 2:(y0 + h) // 2, x0 // 2:(x0 + w) // 2],
            recCr[y0 // 2:(y0 + h) // 2, x0 // 2:(x0 + w) // 2])


def _decode_slice(nal: bytes, sps: dict, pps: dict,
                  ref, stats: dict | None = None):
    """Decode one I or P slice to UNCROPPED (Y, Cb, Cr) planes.

    ``ref``: None (I slices), one (Y, Cb, Cr) planes tuple, or a LIST
    of such tuples — reference list L0, index 0 = most recent decoded
    picture (what :func:`decode_gop` threads)."""
    if not nal:
        raise ValueError("empty NAL")
    nal_type = nal[0] & 0x1F
    if nal_type not in (1, 5):
        raise ValueError(f"not a coded slice NAL (type {nal_type})")
    if pps.get("entropy_coding_mode"):
        raise NotImplementedError("CABAC entropy coding unsupported")
    r = _BitReader(_unescape_rbsp(nal[1:]))
    if r.ue() != 0:
        raise NotImplementedError("multi-slice pictures unsupported")
    slice_type = r.ue()
    st5 = slice_type % 5
    is_p, is_b = st5 == 0, st5 == 1
    if st5 not in (0, 1, 2):  # 2/7 = I, 0/5 = P, 1/6 = B
        raise NotImplementedError(
            f"only I, P and B slices supported (slice_type {slice_type})")
    if (is_p or is_b) and ref is None:
        raise ValueError("P/B slice needs reference pictures")
    r.ue()  # pic_parameter_set_id
    r.u(sps["log2_max_frame_num"])  # frame_num
    if not sps.get("frame_mbs_only", 1):
        raise NotImplementedError("interlaced (field) coding unsupported")
    idr = nal_type == 5
    if idr:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
        if pps.get("bottom_field_poc_present"):
            r.se()
    if pps.get("redundant_pic_cnt_present"):
        r.ue()
    if is_b:
        r.u(1)  # direct_spatial_mv_pred_flag (no direct MBs in subset)
    n_active = pps.get("num_ref_idx_l0_default", 1)
    n_active_l1 = pps.get("num_ref_idx_l1_default", 1)
    if is_p or is_b:
        if r.u(1):  # num_ref_idx_active_override_flag
            n_active = 1 + r.ue()  # num_ref_idx_l0_active_minus1
            if is_b:
                n_active_l1 = 1 + r.ue()
        if r.u(1):  # ref_pic_list_modification_flag_l0
            raise NotImplementedError(
                "reference list modification unsupported")
        if is_b and r.u(1):  # ref_pic_list_modification_flag_l1
            raise NotImplementedError(
                "reference list modification unsupported")
        if is_b and pps.get("weighted_bipred_idc", 0):
            raise NotImplementedError(
                "weighted biprediction unsupported (implicit/explicit)")
        if is_b and (n_active > 1 or n_active_l1 > 1):
            raise NotImplementedError(
                "multiple references per list in B slices unsupported")
    wp = None
    if is_p and pps.get("weighted_pred"):
        # pred_weight_table (7.3.5.4): explicit weighted prediction —
        # per-reference (weight, offset) pairs, luma + both chroma
        ld = r.ue()  # luma_log2_weight_denom
        cd = r.ue()  # chroma_log2_weight_denom
        if ld > 7 or cd > 7:
            raise ValueError("log2 weight denom out of range")
        wlist = []
        for _ in range(n_active):
            lw, lo = 1 << ld, 0
            if r.u(1):  # luma_weight_l0_flag
                lw, lo = r.se(), r.se()
            cwb, cob, cwr, cor = 1 << cd, 0, 1 << cd, 0
            if r.u(1):  # chroma_weight_l0_flag
                cwb, cob = r.se(), r.se()
                cwr, cor = r.se(), r.se()
            wlist.append((lw, lo, cwb, cob, cwr, cor))
        wp = (ld, cd, wlist)
    nal_ref_idc = (nal[0] >> 5) & 3
    if nal_ref_idc:  # dec_ref_pic_marking
        if idr:
            r.u(1)  # no_output_of_prior_pics_flag
            r.u(1)  # long_term_reference_flag
        else:
            if r.u(1):  # adaptive_ref_pic_marking_mode_flag
                raise NotImplementedError(
                    "adaptive ref pic marking unsupported")
    qp = pps.get("pic_init_qp", 26) + r.se()  # slice_qp_delta
    if not 0 <= qp <= 51:
        raise ValueError(f"slice QP {qp} out of range")
    if pps.get("deblocking_filter_control_present"):
        if r.ue() != 1:
            raise NotImplementedError(
                "deblocking (loop) filter unsupported — encode with "
                "disable_deblocking_filter_idc=1")
        # idc == 1: no alpha/beta offsets follow
    else:
        raise NotImplementedError(
            "deblocking (loop) filter unsupported — stream's PPS cannot "
            "switch it off")

    mbs_w, mbs_h = sps["mbs_w"], sps["mbs_h"]
    recY = np.zeros((mbs_h * 16, mbs_w * 16), dtype=np.uint8)
    recCb = np.zeros((mbs_h * 8, mbs_w * 8), dtype=np.uint8)
    recCr = np.zeros((mbs_h * 8, mbs_w * 8), dtype=np.uint8)
    ctx = _CoeffCtx(mbs_w, mbs_h)
    decoded = np.zeros((mbs_h * 4, mbs_w * 4), dtype=bool)
    i4modes = np.full((mbs_h * 4, mbs_w * 4), -1, dtype=np.int8)
    qp_offset = pps.get("chroma_qp_index_offset", 0)
    if is_p:
        refs = [ref] if isinstance(ref[0], np.ndarray) else list(ref)
        if len(refs) < n_active:
            raise ValueError(
                f"slice declares {n_active} active references, decoder "
                f"holds {len(refs)}")
        refY, refCb, refCr = refs[0]
        mvs4 = np.zeros((mbs_h * 4, mbs_w * 4, 2), dtype=np.int32)
        ref4 = np.full((mbs_h * 4, mbs_w * 4), -1, dtype=np.int8)
    if is_b:
        if (not isinstance(ref, tuple) or len(ref) != 2
                or (ref[0] is not None and isinstance(ref[0], np.ndarray))):
            raise ValueError(
                "B slice needs (past_list, future_list) reference lists")
        l0_list, l1_list = ref
        if not l0_list or not l1_list:
            raise ValueError(
                "B slice needs a past (L0) and a future (L1) reference")
        bi_refs = (l0_list[0], l1_list[0])
        # per-list MV state (the 8.4.1.3 prediction runs per list)
        mvs4b = [np.zeros((mbs_h * 4, mbs_w * 4, 2), dtype=np.int32)
                 for _ in range(2)]
        ref4b = [np.full((mbs_h * 4, mbs_w * 4), -1, dtype=np.int8)
                 for _ in range(2)]

    def _bump(key):
        if stats is not None:
            stats[key] = stats.get(key, 0) + 1

    def _wl(p, ri):
        """Weight a luma prediction for reference ``ri`` (no-op without
        a pred_weight_table)."""
        if wp is None:
            return p
        return _wp_apply(p, wp[2][ri][0], wp[2][ri][1], wp[0])

    def _wc(p, ri, comp):
        """Weight a chroma prediction (comp 0 = Cb, 1 = Cr)."""
        if wp is None:
            return p
        w_, o_ = wp[2][ri][2 + 2 * comp], wp[2][ri][3 + 2 * comp]
        return _wp_apply(p, w_, o_, wp[1])

    n_mbs = mbs_w * mbs_h
    addr = 0
    while addr < n_mbs:
        if is_b:
            if r.ue():  # mb_skip_run: B_Skip decodes via direct inference
                raise NotImplementedError(
                    "B_Skip (direct-mode inference) unsupported")
        if is_p:
            run = r.ue()
            if addr + run > n_mbs:
                raise ValueError("mb_skip_run overruns the slice")
            for _ in range(run):  # P_Skip MBs (spec 8.4.1.1 inference)
                mby, mbx = divmod(addr, mbs_w)
                addr += 1
                yx, yy = mbx * 16, mby * 16
                cx, cy = mbx * 8, mby * 8
                bx0, by0 = mbx * 4, mby * 4
                mv = _skip_mv(mvs4, ref4, decoded, mbx, mby)
                recY[yy:yy + 16, yx:yx + 16] = _wl(
                    _mc_luma(refY, yx, yy, mv), 0)
                recCb[cy:cy + 8, cx:cx + 8] = _wc(
                    _mc_chroma(refCb, cx, cy, mv), 0, 0)
                recCr[cy:cy + 8, cx:cx + 8] = _wc(
                    _mc_chroma(refCr, cx, cy, mv), 0, 1)
                mvs4[by0:by0 + 4, bx0:bx0 + 4] = mv
                ref4[by0:by0 + 4, bx0:bx0 + 4] = 0
                decoded[by0:by0 + 4, bx0:bx0 + 4] = True
                _bump("skip")
                if mv[0] & 3 or mv[1] & 3:
                    _bump("qpel")
            if addr >= n_mbs:
                break
        mby, mbx = divmod(addr, mbs_w)
        addr += 1
        yx, yy = mbx * 16, mby * 16
        cx, cy = mbx * 8, mby * 8
        bx0, by0 = mbx * 4, mby * 4
        mb_type = r.ue()
        if is_p:
            if mb_type < 5:  # inter MB (Table 7-13)
                shape, plist = _P_SHAPE_BY_TYPE[
                    3 if mb_type == 4 else mb_type]  # 4 = P_8x8ref0
                sub_types = None
                if mb_type in (3, 4):
                    sub_types = [r.ue() for _ in range(4)]  # Table 7-14
                    if any(s > 3 for s in sub_types):
                        raise ValueError(
                            f"invalid sub_mb_type in {sub_types}")
                    plist = _p8x8_plist(sub_types)

                def _read_ref() -> int:
                    if n_active == 1:
                        return 0
                    ri = (1 - r.u(1)) if n_active == 2 else r.ue()  # te(v)
                    if ri >= n_active:
                        raise ValueError(
                            f"ref_idx_l0 {ri} >= active count {n_active}")
                    return ri

                # ref_idx_l0 precedes the mvds (7.3.5.1/7.3.5.2): one per
                # partition, or one per 8x8 quadrant (its sub-partitions
                # share it); P_8x8ref0 (mb_type 4) infers 0
                if mb_type in (3, 4):
                    quad_refs = ([0] * 4 if mb_type == 4
                                 else [_read_ref() for _ in range(4)])
                    prefs = []
                    for qi, smt in enumerate(sub_types):
                        prefs += [quad_refs[qi]] * len(_SUB_SHAPES[smt])
                else:
                    prefs = [_read_ref() for _ in plist]
                mvds = [(r.se(), r.se()) for _ in plist]
                code_num = r.ue()
                if code_num > 47:
                    raise ValueError(
                        f"invalid coded_block_pattern {code_num}")
                cbp = _CBP_INTER[code_num]
                cbp_luma4, cbp_chroma = cbp & 15, cbp >> 4
                if cbp:
                    qp = (qp + r.se() + 52) % 52
                qpc = hr.chroma_qp(qp, qp_offset)
                blocks4 = _read_i4_luma_residual(r, ctx, mbx, mby,
                                                 cbp_luma4)
                dcCb, acCb, dcCr, acCr = _read_chroma_residual(
                    r, ctx, mbx, mby, cbp_chroma)
                predY = np.empty((16, 16), dtype=np.uint8)
                predCb = np.empty((8, 8), dtype=np.uint8)
                predCr = np.empty((8, 8), dtype=np.uint8)
                frac = multiref = False
                # partitions reconstruct sequentially: the second one's
                # predictor reads the first's mv/refidx from the grids
                for (tag, ox, oy, wb, hb), mvd, ri in zip(plist, mvds,
                                                          prefs):
                    bx, by = bx0 + ox, by0 + oy
                    px, py = yx + ox * 4, yy + oy * 4
                    mvp = _mv_pred(mvs4, ref4, decoded, bx, by, wb,
                                   part=tag, refidx=ri)
                    mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
                    frac = frac or bool(mv[0] & 3 or mv[1] & 3)
                    multiref = multiref or ri > 0
                    rY_, rCb_, rCr_ = refs[ri]
                    predY[oy * 4:oy * 4 + hb * 4, ox * 4:ox * 4 + wb * 4] \
                        = _wl(_mc_luma(rY_, px, py, mv,
                                       (hb * 4, wb * 4)), ri)
                    predCb[oy * 2:oy * 2 + hb * 2,
                           ox * 2:ox * 2 + wb * 2] = _wc(_mc_chroma(
                        rCb_, cx + ox * 2, cy + oy * 2, mv,
                        (hb * 2, wb * 2)), ri, 0)
                    predCr[oy * 2:oy * 2 + hb * 2,
                           ox * 2:ox * 2 + wb * 2] = _wc(_mc_chroma(
                        rCr_, cx + ox * 2, cy + oy * 2, mv,
                        (hb * 2, wb * 2)), ri, 1)
                    mvs4[by:by + hb, bx:bx + wb] = mv
                    ref4[by:by + hb, bx:bx + wb] = ri
                    decoded[by:by + hb, bx:bx + wb] = True
                recY[yy:yy + 16, yx:yx + 16] = _recon_luma_blocks4(
                    predY, blocks4, qp)
                recCb[cy:cy + 8, cx:cx + 8] = hr.recon_chroma8(
                    predCb, dcCb, acCb, qpc)
                recCr[cy:cy + 8, cx:cx + 8] = hr.recon_chroma8(
                    predCr, dcCr, acCr, qpc)
                decoded[by0:by0 + 4, bx0:bx0 + 4] = True
                _bump("p16" if shape == "16x16" else f"p{shape}")
                if sub_types is not None and any(sub_types):
                    _bump("psub")
                if frac:
                    _bump("qpel")
                if multiref:
                    _bump("multiref")
                continue
            mb_type -= 5  # intra MB in a P slice (Table 7-13 offset)
        if is_b:
            if mb_type < 23:  # inter B MB (Table 7-14 mb_type column)
                if mb_type == 0:
                    raise NotImplementedError(
                        "B_Direct_16x16 (direct prediction) unsupported")
                if mb_type > 3:
                    raise NotImplementedError(
                        "B partitions below 16x16 unsupported")
                use_l = (mb_type in (1, 3), mb_type in (2, 3))  # L0, L1
                mvds_b = [(r.se(), r.se()) if u else None for u in use_l]
                code_num = r.ue()
                if code_num > 47:
                    raise ValueError(
                        f"invalid coded_block_pattern {code_num}")
                cbp = _CBP_INTER[code_num]
                cbp_luma4, cbp_chroma = cbp & 15, cbp >> 4
                if cbp:
                    qp = (qp + r.se() + 52) % 52
                qpc = hr.chroma_qp(qp, qp_offset)
                blocks4 = _read_i4_luma_residual(r, ctx, mbx, mby,
                                                 cbp_luma4)
                dcCb, acCb, dcCr, acCr = _read_chroma_residual(
                    r, ctx, mbx, mby, cbp_chroma)
                preds = []
                frac = False
                for li in (0, 1):
                    if not use_l[li]:
                        continue
                    mvp = _mv_pred(mvs4b[li], ref4b[li], decoded,
                                   bx0, by0, 4)
                    mv = (mvp[0] + mvds_b[li][0], mvp[1] + mvds_b[li][1])
                    frac = frac or bool(mv[0] & 3 or mv[1] & 3)
                    rY_, rCb_, rCr_ = bi_refs[li]
                    preds.append((
                        _mc_luma(rY_, yx, yy, mv),
                        _mc_chroma(rCb_, cx, cy, mv),
                        _mc_chroma(rCr_, cx, cy, mv)))
                    mvs4b[li][by0:by0 + 4, bx0:bx0 + 4] = mv
                    ref4b[li][by0:by0 + 4, bx0:bx0 + 4] = 0
                if len(preds) == 2:  # default biprediction: average
                    predY, predCb, predCr = (
                        ((a.astype(np.int64) + b + 1) >> 1).astype(np.uint8)
                        for a, b in zip(preds[0], preds[1]))
                else:
                    predY, predCb, predCr = preds[0]
                recY[yy:yy + 16, yx:yx + 16] = _recon_luma_blocks4(
                    predY, blocks4, qp)
                recCb[cy:cy + 8, cx:cx + 8] = hr.recon_chroma8(
                    predCb, dcCb, acCb, qpc)
                recCr[cy:cy + 8, cx:cx + 8] = hr.recon_chroma8(
                    predCr, dcCr, acCr, qpc)
                decoded[by0:by0 + 4, bx0:bx0 + 4] = True
                _bump({1: "b_l0", 2: "b_l1", 3: "b_bi"}[mb_type])
                if frac:
                    _bump("qpel")
                continue
            mb_type -= 23  # intra MB in a B slice (Table 7-14 offset)
        if mb_type == 25:  # I_PCM
            r.align()
            recY[yy:yy + 16, yx:yx + 16] = np.frombuffer(
                r.read_bytes(256), dtype=np.uint8).reshape(16, 16)
            recCb[cy:cy + 8, cx:cx + 8] = np.frombuffer(
                r.read_bytes(64), dtype=np.uint8).reshape(8, 8)
            recCr[cy:cy + 8, cx:cx + 8] = np.frombuffer(
                r.read_bytes(64), dtype=np.uint8).reshape(8, 8)
            ctx.mark_pcm(mbx, mby)
            decoded[by0:by0 + 4, bx0:bx0 + 4] = True
            if stats is not None:
                stats["pcm"] = stats.get("pcm", 0) + 1
            continue
        if mb_type == 0:  # I_4x4 (I_NxN)
            # mb_pred: the 16 per-block mode elements, parse order
            modes4 = []
            for blk, (ox, oy) in enumerate(hr.LUMA_BLOCK_ORDER):
                bx, by = bx0 + ox, by0 + oy
                mpm = _most_probable_i4_mode(i4modes, bx, by)
                if r.u(1):
                    m = mpm
                else:
                    rem = r.u(3)
                    m = rem if rem < mpm else rem + 1
                i4modes[by, bx] = m
                modes4.append(m)
            cmode = r.ue()
            if cmode > 3:
                raise ValueError(
                    f"invalid intra_chroma_pred_mode {cmode}")
            code_num = r.ue()
            if code_num > 47:
                raise ValueError(f"invalid coded_block_pattern {code_num}")
            cbp = _CBP_INTRA[code_num]
            cbp_luma4, cbp_chroma = cbp & 15, cbp >> 4
            if cbp:
                qp = (qp + r.se() + 52) % 52
            qpc = hr.chroma_qp(qp, qp_offset)
            blocks4 = _read_i4_luma_residual(r, ctx, mbx, mby, cbp_luma4)
            dcCb, acCb, dcCr, acCr = _read_chroma_residual(
                r, ctx, mbx, mby, cbp_chroma)
            for blk, (ox, oy) in enumerate(hr.LUMA_BLOCK_ORDER):
                x, y = yx + ox * 4, yy + oy * 4
                preds = _pred_luma4(recY, x, y, decoded)
                if modes4[blk] not in preds:
                    raise ValueError(
                        f"Intra_4x4 mode {modes4[blk]} needs unavailable "
                        f"neighbors at block ({x // 4},{y // 4})")
                d = hr.dequant4x4_ac(hr.scan_to_mat(blocks4[blk]), qp)
                res = hr.inv4x4(d)
                recY[y:y + 4, x:x + 4] = np.clip(
                    preds[modes4[blk]].astype(np.int64) + res, 0,
                    255).astype(np.uint8)
                decoded[by0 + oy, bx0 + ox] = True
            cpb = _pred_chroma8(recCb, cx, cy)
            cpr = _pred_chroma8(recCr, cx, cy)
            if cmode not in cpb:
                raise ValueError(
                    f"chroma mode {cmode} needs unavailable neighbors "
                    f"at mb ({mbx},{mby})")
            recCb[cy:cy + 8, cx:cx + 8] = hr.recon_chroma8(
                cpb[cmode], dcCb, acCb, qpc)
            recCr[cy:cy + 8, cx:cx + 8] = hr.recon_chroma8(
                cpr[cmode], dcCr, acCr, qpc)
            if stats is not None:
                stats["i4"] = stats.get("i4", 0) + 1
            continue
        if not 1 <= mb_type <= 24:
            raise ValueError(f"invalid I-slice mb_type {mb_type}")
        # Table 7-11: mb_type-1 -> (pred_mode, cbp_chroma, cbp_luma)
        pm = (mb_type - 1) % 4
        cbp_chroma = ((mb_type - 1) // 4) % 3
        cbp_luma = 15 if mb_type >= 13 else 0
        cmode = r.ue()  # intra_chroma_pred_mode
        if cmode > 3:
            raise ValueError(f"invalid intra_chroma_pred_mode {cmode}")
        # mb_qp_delta: QPy = (QPy,prev + delta + 52) % 52 (spec 7.4.5)
        qp = (qp + r.se() + 52) % 52
        qpc = hr.chroma_qp(qp, qp_offset)
        dcL, acL, dcCb, acCb, dcCr, acCr = _read_i16_residual(
            r, ctx, mbx, mby, cbp_luma, cbp_chroma)
        lp = _pred_luma16(recY, yx, yy)
        if pm not in lp:
            raise ValueError(
                f"Intra_16x16 mode {pm} needs unavailable neighbors at "
                f"mb ({mbx},{mby})")
        cpb = _pred_chroma8(recCb, cx, cy)
        cpr = _pred_chroma8(recCr, cx, cy)
        if cmode not in cpb:
            raise ValueError(
                f"chroma mode {cmode} needs unavailable neighbors at "
                f"mb ({mbx},{mby})")
        recY[yy:yy + 16, yx:yx + 16] = hr.recon_luma16(lp[pm], dcL, acL, qp)
        recCb[cy:cy + 8, cx:cx + 8] = hr.recon_chroma8(
            cpb[cmode], dcCb, acCb, qpc)
        recCr[cy:cy + 8, cx:cx + 8] = hr.recon_chroma8(
            cpr[cmode], dcCr, acCr, qpc)
        decoded[by0:by0 + 4, bx0:bx0 + 4] = True
        if stats is not None:
            stats["i16"] = stats.get("i16", 0) + 1
    return recY, recCb, recCr


# ---------------------------------------------------------------------------
# MP4 sample glue (ISO 14496-15 length-prefixed NALs)
# ---------------------------------------------------------------------------

def avc_sample(nals: list[bytes], nal_length_size: int = 4) -> bytes:
    """Wrap NAL units as one MP4 sample (length-prefixed, 14496-15)."""
    if nal_length_size != 4:
        raise ValueError("only 4-byte NAL length prefixes emitted")
    return b"".join(struct.pack(">I", len(n)) + n for n in nals)


def decode_avc_sample(sample: bytes, avcc: bytes | dict) -> np.ndarray:
    """Decode an MP4 avc1 sample (length-prefixed NALs) to RGB using the
    track's avcC configuration (raw box payload bytes or a parse_avcc
    dict)."""
    cfg = parse_avcc(avcc) if isinstance(avcc, (bytes, bytearray)) \
        else avcc
    if not cfg["sps"] or not cfg["pps"]:
        raise ValueError("avcC carries no SPS/PPS")
    sps = parse_sps(cfg["sps"][0])
    pps = parse_pps(cfg["pps"][0])
    nls = cfg["nal_length_size"]
    pos = 0
    while pos + nls <= len(sample):
        ln = int.from_bytes(sample[pos:pos + nls], "big")
        pos += nls
        if pos + ln > len(sample):
            raise ValueError("truncated NAL in sample")
        nal = sample[pos:pos + ln]
        pos += ln
        if nal and (nal[0] & 0x1F) in (1, 5):
            return decode_iframe(nal, sps, pps)
    raise ValueError("sample contains no coded slice NAL")
