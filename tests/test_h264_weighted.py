"""Explicit weighted prediction for P slices (spec 8.4.2.3.2 — the fade
tool): pred_weight_table syntax round trip, bit-exact weighted P_Skip on
a pure fade, the auto least-squares fit beating unweighted coding on a
dimming GOP, and the per-reference validation guard.
"""
import numpy as np
import pytest

from sparksketch.h264 import (_decode_slice, _wp_apply, decode_gop,
                              encode_gop, encode_iframe, encode_pframe,
                              rgb_to_yuv420, yuv420_to_rgb)
from sparksketch.mp4 import encode_pps, encode_sps, parse_pps, parse_sps


def _cfg(w, h, weighted=False, n_refs=1):
    return (parse_sps(encode_sps(w, h, fps=10.0,
                                 max_num_ref_frames=n_refs)),
            parse_pps(encode_pps(deblocking_control=True,
                                 weighted_pred=weighted)))


def _gray(p):
    return np.repeat(p[:, :, None], 3, axis=2)


class TestWeightedPrediction:
    def test_wp_apply_spec_values(self):
        p = np.array([[0, 100, 255]], dtype=np.uint8)
        # w=16 d=5 -> x0.5 with round-half-up, +10 offset
        assert _wp_apply(p, 16, 10, 5).tolist() == [[10, 60, 138]]
        # d=0: plain scale+offset, clipped
        assert _wp_apply(p, 2, -100, 0).tolist() == [[0, 100, 255]]

    def test_pure_fade_is_all_weighted_skip_bit_exact(self):
        """f1 = ((f0*16+16)>>5)+10 exactly: with weights (16,10)@d=5 the
        weighted prediction at the skip vector is bit-exact, so every MB
        is P_Skip and the NAL is a handful of bytes."""
        rng = np.random.default_rng(101)
        f0 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        f1 = _wp_apply(f0, 16, 10, 5)
        sps, ppsw = _cfg(48, 32, weighted=True)
        _, pps0 = _cfg(48, 32)
        inal = encode_iframe(_gray(f0), pcm_mad=-1, qp=0)
        rec0 = _decode_slice(inal, sps, pps0, None)
        wts = (5, 5, [(16, 10, 32, 0, 32, 0)])
        pnal = encode_pframe(_gray(f1), rec0, qp=0, pcm_mad=0.0,
                             frame_num=1, weighted=wts)
        assert len(pnal) < 16  # header + one mb_skip_run
        st = {}
        outs = decode_gop([inal, pnal], sps, ppsw, stats=st)
        assert st.get("skip", 0) == 6, st
        assert np.array_equal(rgb_to_yuv420(outs[1])[0], f1)

    def test_auto_fit_beats_unweighted_on_dimming_gop(self):
        rng = np.random.default_rng(103)
        base = (np.cumsum(rng.integers(0, 4, (48, 80)), axis=1)
                % 180 + 50).astype(np.uint8)
        frames = [_gray(np.clip(np.round(base * (1.0 - 0.18 * k)), 0,
                                255).astype(np.uint8))
                  for k in range(4)]
        plain = encode_gop(frames, qp=24, pcm_mad=6.0)
        fitted = encode_gop(frames, qp=24, pcm_mad=6.0, weighted="auto")
        assert sum(map(len, fitted[1:])) < 0.6 * sum(map(len, plain[1:]))
        sps, ppsw = _cfg(80, 48, weighted=True)
        st = {}
        outs = decode_gop(fitted, sps, ppsw, stats=st)
        assert st.get("skip", 0) + st.get("p16", 0) > 0
        for fr, out in zip(frames, outs):
            recon = yuv420_to_rgb(*rgb_to_yuv420(fr))
            err = np.abs(out.astype(int) - recon.astype(int))
            assert err.mean() < 5.0

    def test_chroma_weight_syntax_roundtrip(self):
        """Non-default chroma weights must survive the slice-header
        round trip: a steady gray scene coded with a +5 Cb offset still
        decodes near-losslessly at qp 0 (the residual compensates the
        deliberate chroma mis-prediction, proving decoder and encoder
        read/write the same table)."""
        rng = np.random.default_rng(107)
        f0 = rng.integers(40, 200, (32, 48), dtype=np.uint8)
        sps, ppsw = _cfg(48, 32, weighted=True)
        _, pps0 = _cfg(48, 32)
        inal = encode_iframe(_gray(f0), pcm_mad=-1, qp=0)
        rec0 = _decode_slice(inal, sps, pps0, None)
        wts = (5, 5, [(32, 0, 32, 5, 32, -3)])
        pnal = encode_pframe(_gray(f0), rec0, qp=0, pcm_mad=2.0,
                             frame_num=1, weighted=wts)
        outs = decode_gop([inal, pnal], sps, ppsw)
        recon = yuv420_to_rgb(*rgb_to_yuv420(_gray(f0)))
        err = np.abs(outs[1].astype(int) - recon.astype(int))
        assert err.max() <= 6  # chroma offset fully compensated +-round

    def test_weights_must_cover_every_reference(self):
        rng = np.random.default_rng(109)
        f0 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        sps, pps0 = _cfg(48, 32)
        inal = encode_iframe(_gray(f0), pcm_mad=-1, qp=0)
        rec0 = _decode_slice(inal, sps, pps0, None)
        with pytest.raises(ValueError, match="per reference"):
            encode_pframe(_gray(f0), [rec0, rec0], qp=0, pcm_mad=2.0,
                          weighted=(5, 5, [(32, 0, 32, 0, 32, 0)]))
