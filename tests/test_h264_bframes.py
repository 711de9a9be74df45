"""B slices (B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 subset): two
reference lists split around the picture's POC, default-average
biprediction, non-reference NALs, display-order reordering in
decode_gop, and bit-exact reconstruction against lossless anchors.
"""
import numpy as np
import pytest

from sparksketch.h264 import (_decode_slice, decode_gop, encode_bframe,
                              encode_gop_b, encode_iframe, encode_pframe,
                              rgb_to_yuv420, yuv420_to_rgb)
from sparksketch.mp4 import encode_pps, encode_sps, parse_pps, parse_sps


def _cfg(w, h, n_refs=2):
    return (parse_sps(encode_sps(w, h, fps=10.0,
                                 max_num_ref_frames=n_refs)),
            parse_pps(encode_pps(deblocking_control=True)))


def _gray(p):
    return np.repeat(p[:, :, None], 3, axis=2)


def _shift(img, dx):
    xs = np.clip(np.arange(img.shape[1]) + dx, 0, img.shape[1] - 1)
    return img[:, xs]


def _lossless_anchors(f0, f2, w, h, qp=0):
    """I + P anchor NALs forced to I_PCM (pcm_mad=-1): bit-exact
    references for the exactness fixtures."""
    sps, pps = _cfg(w, h)
    inal = encode_iframe(_gray(f0), pcm_mad=-1, qp=qp)
    rec0 = _decode_slice(inal, sps, pps, None)
    pnal = encode_pframe(_gray(f2), rec0, qp=qp, pcm_mad=-1,
                         frame_num=1, poc=4)
    rec2 = _decode_slice(pnal, sps, pps, rec0)
    return inal, pnal, rec0, rec2, sps, pps


class TestBExactness:
    def test_bi_average_bit_exact(self):
        """The B frame IS the (p0+p1+1)>>1 average of its anchors: the
        encoder must pick B_Bi with zero mvs and zero residual, and the
        decode must be bit-identical through the written stream."""
        rng = np.random.default_rng(73)
        f0 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        f2 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        f1 = ((f0.astype(np.int64) + f2 + 1) >> 1).astype(np.uint8)
        inal, pnal, rec0, rec2, sps, pps = _lossless_anchors(f0, f2, 48, 32)
        bnal = encode_bframe(_gray(f1), rec0, rec2, qp=0, pcm_mad=0.0,
                             frame_num=1, poc=1)
        assert bnal[0] == 0x01  # non-reference NAL
        st = {}
        outs = decode_gop([inal, pnal, bnal], sps, pps, stats=st)
        assert st.get("b_bi", 0) == 6, st
        assert st.get("pcm", 0) == 12  # the two anchors only
        # display order: f0, f1, f2
        assert np.array_equal(rgb_to_yuv420(outs[0])[0], f0)
        assert np.array_equal(rgb_to_yuv420(outs[1])[0], f1)
        assert np.array_equal(rgb_to_yuv420(outs[2])[0], f2)

    def test_l1_only_prediction_bit_exact(self):
        """B content matching only the FUTURE anchor must ride
        B_L1_16x16 exactly (the case forward-only prediction cannot
        express)."""
        rng = np.random.default_rng(79)
        f0 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        base = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=1)
                % 170 + 40).astype(np.uint8)
        f2 = base
        f1 = _shift(base, 2)  # a shift of the FUTURE anchor
        inal, pnal, rec0, rec2, sps, pps = _lossless_anchors(f0, f2, 48, 32)
        bnal = encode_bframe(_gray(f1), rec0, rec2, qp=0, pcm_mad=0.0,
                             frame_num=1, poc=1)
        st = {}
        outs = decode_gop([inal, pnal, bnal], sps, pps, stats=st)
        assert st.get("b_l1", 0) == 6, st
        assert np.array_equal(rgb_to_yuv420(outs[1])[0], f1)


class TestBGop:
    def test_translating_gop_compresses_and_reorders(self):
        rng = np.random.default_rng(83)
        base = (np.cumsum(rng.integers(0, 4, (48, 80)), axis=1)
                % 180 + 30).astype(np.uint8)
        frames = [_gray(_shift(base, 2 * f)) for f in range(7)]
        nals = encode_gop_b(frames, qp=22, pcm_mad=5.0)
        sps, pps = _cfg(80, 48)
        st = {}
        outs = decode_gop(nals, sps, pps, stats=st)
        assert st.get("b_l0", 0) + st.get("b_l1", 0) \
            + st.get("b_bi", 0) > 0, st
        assert len(outs) == len(frames)
        assert all(len(n) < len(nals[0]) / 2 for n in nals[1:])
        # decode_gop returns DISPLAY order: each output must match ITS
        # OWN source frame (a reordering bug would misalign the motion)
        for fr, out in zip(frames, outs):
            recon = yuv420_to_rgb(*rgb_to_yuv420(fr))
            err = np.abs(out.astype(int) - recon.astype(int))
            assert err.mean() < 5.0

    def test_even_frame_count_trailing_p(self):
        rng = np.random.default_rng(89)
        base = (np.cumsum(rng.integers(0, 4, (32, 48)), axis=1)
                % 180 + 30).astype(np.uint8)
        frames = [_gray(_shift(base, f)) for f in range(4)]
        nals = encode_gop_b(frames, qp=24, pcm_mad=5.0)
        sps, pps = _cfg(48, 32)
        outs = decode_gop(nals, sps, pps)
        assert len(outs) == 4
        for fr, out in zip(frames, outs):
            recon = yuv420_to_rgb(*rgb_to_yuv420(fr))
            assert np.abs(out.astype(int) - recon.astype(int)).mean() < 6.0

    def test_b_needs_both_lists(self):
        rng = np.random.default_rng(97)
        f0 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        f2 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        f1 = ((f0.astype(np.int64) + f2 + 1) >> 1).astype(np.uint8)
        inal, pnal, rec0, rec2, sps, pps = _lossless_anchors(f0, f2, 48, 32)
        bnal = encode_bframe(_gray(f1), rec0, rec2, qp=0, pcm_mad=0.0,
                             frame_num=1, poc=1)
        with pytest.raises(ValueError, match="past"):
            _decode_slice(bnal, sps, pps, rec0)  # a bare planes tuple
        with pytest.raises(ValueError, match="future"):
            _decode_slice(bnal, sps, pps, ([rec0], []))
