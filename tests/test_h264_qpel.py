"""Quarter-sample luma motion compensation (spec 8.4.2.2.1) — conformance
of the vectorized interpolator against an independent scalar reference
written sample-by-sample from the spec text, plus end-to-end GOP behavior
with genuinely fractional motion.
"""
import numpy as np
import pytest

from sparksketch.h264 import (_mc_luma, decode_gop, decode_iframe_planes,
                              encode_gop, encode_iframe, encode_pframe,
                              rgb_to_yuv420, yuv420_to_rgb)
from sparksketch.mp4 import encode_pps, encode_sps, parse_pps, parse_sps


def _cfg(w, h):
    return (parse_sps(encode_sps(w, h, fps=10.0)),
            parse_pps(encode_pps(deblocking_control=True)))


# -- independent scalar reference of 8.4.2.2.1 ------------------------------
# Written directly from the spec's sample equations (Clip3'd full-sample
# addressing, per-position 6-tap sums, Table 8-12 quarter averaging) with
# per-pixel loops — structurally unlike the production vectorized code, so
# agreement is evidence, not tautology.

def _ref_px(ref, y, x):
    h, w = ref.shape
    return int(ref[min(max(y, 0), h - 1), min(max(x, 0), w - 1)])


def _half_h(ref, y, x):  # un-normalized b1 at integer row y, half col x+1/2
    return sum(t * _ref_px(ref, y, x + k - 2)
               for k, t in enumerate((1, -5, 20, 20, -5, 1)))


def _half_v(ref, y, x):  # un-normalized h1 at half row y+1/2, integer col x
    return sum(t * _ref_px(ref, y + k - 2, x)
               for k, t in enumerate((1, -5, 20, 20, -5, 1)))


def _clip8(v):
    return min(max(v, 0), 255)


def _ref_interp(ref, y, x, xf, yf):
    """One luma sample at full-sample (y, x) + (xf, yf)/4 displacement."""
    G = _ref_px(ref, y, x)
    b = _clip8((_half_h(ref, y, x) + 16) >> 5)
    hh = _clip8((_half_v(ref, y, x) + 16) >> 5)
    # j: 6-tap over the un-normalized horizontal intermediates (8.4.2.2.1)
    j1 = sum(t * _half_h(ref, y + k - 2, x)
             for k, t in enumerate((1, -5, 20, 20, -5, 1)))
    j = _clip8((j1 + 512) >> 10)
    H = _ref_px(ref, y, x + 1)
    M = _ref_px(ref, y + 1, x)
    m = _clip8((_half_v(ref, y, x + 1) + 16) >> 5)
    s = _clip8((_half_h(ref, y + 1, x) + 16) >> 5)
    table = {
        (0, 0): G, (2, 0): b, (0, 2): hh, (2, 2): j,
        (1, 0): (G + b + 1) >> 1, (3, 0): (b + H + 1) >> 1,
        (0, 1): (G + hh + 1) >> 1, (1, 1): (b + hh + 1) >> 1,
        (2, 1): (b + j + 1) >> 1, (3, 1): (b + m + 1) >> 1,
        (1, 2): (hh + j + 1) >> 1, (3, 2): (j + m + 1) >> 1,
        (0, 3): (hh + M + 1) >> 1, (1, 3): (hh + s + 1) >> 1,
        (2, 3): (j + s + 1) >> 1, (3, 3): (m + s + 1) >> 1,
    }
    return table[(xf, yf)]


class TestQpelConformance:
    def test_all_sixteen_subpositions_match_spec_reference(self):
        rng = np.random.default_rng(11)
        ref = rng.integers(0, 256, (40, 40), dtype=np.uint8)
        for xf in range(4):
            for yf in range(4):
                mv = (4 * 2 + xf, 4 * 1 + yf)
                got = _mc_luma(ref, 8, 8, mv)
                want = np.array(
                    [[_ref_interp(ref, 8 + 1 + yy, 8 + 2 + xx, xf, yf)
                      for xx in range(16)] for yy in range(16)],
                    dtype=np.uint8)
                assert np.array_equal(got, want), (xf, yf)

    def test_subpositions_match_at_picture_edges(self):
        # displacements that push the 6-tap window past every border
        # exercise the Clip3 addressing on both axes
        rng = np.random.default_rng(13)
        ref = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        for mvx, mvy in [(-13, -9), (-2, 37), (41, 3), (35, 33), (5, -6)]:
            xi, xf = mvx >> 2, mvx & 3
            yi, yf = mvy >> 2, mvy & 3
            got = _mc_luma(ref, 4, 4, (mvx, mvy))
            want = np.array(
                [[_ref_interp(ref, 4 + yi + yy, 4 + xi + xx, xf, yf)
                  for xx in range(16)] for yy in range(16)],
                dtype=np.uint8)
            assert np.array_equal(got, want), (mvx, mvy)

    def test_integer_path_unchanged(self):
        ref = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
        out = _mc_luma(ref, 0, 0, (4 * 3, 4 * 2))
        assert np.array_equal(out, ref[2:18, 3:19])


class TestQpelGop:
    def test_half_pel_shift_is_found_and_bit_exact(self):
        """Frame 1 is EXACTLY the half-sample interpolation of frame 0:
        the encoder's refinement must find mv=(2,0)-class vectors and emit
        zero luma residual, and the decoder must reproduce frame 1
        bit-identically (interpolators agree end-to-end through the
        written bitstream)."""
        rng = np.random.default_rng(17)
        # smooth-ish gray base so rgb<->yuv is lossless (r=g=b => Y=v,
        # chroma exactly 128) and interpolation is meaningful
        base = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=1)
                % 160 + 40).astype(np.uint8)
        shifted = np.empty_like(base)
        for mby in range(2):
            for mbx in range(3):
                shifted[mby * 16:mby * 16 + 16, mbx * 16:mbx * 16 + 16] = \
                    _mc_luma(base, mbx * 16, mby * 16, (2, 0))
        gray = lambda p: np.repeat(p[:, :, None], 3, axis=2)
        # pcm_mad=-1 forces a lossless all-I_PCM reference frame, so the
        # P frame's best prediction (mv class (2,0)) matches `shifted`
        # EXACTLY and the encoder emits zero residual — any interpolator
        # disagreement between encoder and decoder would break the
        # equality below
        inal = encode_iframe(gray(base), pcm_mad=-1, qp=0)
        pnal = encode_pframe(gray(shifted),
                             decode_iframe_planes(inal, *_cfg(48, 32)),
                             qp=0, pcm_mad=0.0)
        sps, pps = _cfg(48, 32)
        st = {}
        outs = decode_gop([inal, pnal], sps, pps, stats=st)
        assert st.get("qpel", 0) > 0, st
        assert np.array_equal(rgb_to_yuv420(outs[0])[0], base)
        gotY = rgb_to_yuv420(outs[1])[0]
        assert np.array_equal(gotY, shifted)

    def test_quarter_pel_improves_over_integer_motion(self):
        """A scene translating by a non-integer displacement should spend
        fewer residual bits with fractional refinement than the pure
        integer vectors could: every P NAL stays far below the I NAL and
        the decode error stays bounded."""
        rng = np.random.default_rng(19)
        base = (np.cumsum(rng.integers(0, 3, (48, 80)), axis=1)
                % 170 + 40).astype(np.uint8)
        frames = []
        for f in range(4):
            mv = (3 * f, 0)   # +0.75 luma sample per frame
            fr = np.empty_like(base)
            for mby in range(3):
                for mbx in range(5):
                    fr[mby * 16:mby * 16 + 16, mbx * 16:mbx * 16 + 16] = \
                        _mc_luma(base, mbx * 16, mby * 16, mv)
            frames.append(np.repeat(fr[:, :, None], 3, axis=2))
        nals = encode_gop(frames, qp=20, pcm_mad=4.0)
        assert all(len(n) < len(nals[0]) / 2 for n in nals[1:])
        sps, pps = _cfg(80, 48)
        st = {}
        outs = decode_gop(nals, sps, pps, stats=st)
        assert st.get("qpel", 0) > 0
        for fr, out in zip(frames, outs):
            recon = yuv420_to_rgb(*rgb_to_yuv420(fr))
            err = np.abs(out.astype(int) - recon.astype(int))
            assert err.mean() < 4.0
