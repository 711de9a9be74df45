"""Multiple reference pictures (reference list L0, sliding-window DPB):
te(v) ref_idx syntax, refidx-aware MV prediction, per-partition
reference selection, and exact reconstruction when only an OLDER
reference contains the matching content (the occlusion/flash case
single-reference prediction cannot express).
"""
import numpy as np
import pytest

from sparksketch.h264 import (decode_gop, decode_pframe_planes, encode_gop,
                              rgb_to_yuv420, yuv420_to_rgb)
from sparksketch.mp4 import encode_pps, encode_sps, parse_pps, parse_sps


def _cfg(w, h, n_refs=1):
    return (parse_sps(encode_sps(w, h, fps=10.0,
                                 max_num_ref_frames=n_refs)),
            parse_pps(encode_pps(deblocking_control=True)))


def _gray(p):
    return np.repeat(p[:, :, None], 3, axis=2)


def _shift(img, dx, dy):
    ys = np.clip(np.arange(img.shape[0]) + dy, 0, img.shape[0] - 1)
    xs = np.clip(np.arange(img.shape[1]) + dx, 0, img.shape[1] - 1)
    return img[np.ix_(ys, xs)]


class TestMultiRef:
    def test_flash_frame_predicts_from_older_reference_exactly(self):
        """Scene A, an unrelated flash frame, then A shifted: with two
        references the third frame predicts from ref_idx 1 (the A
        frame behind the flash) with zero residual — bit-exact through
        the written te(v)=1-bit ref_idx syntax."""
        rng = np.random.default_rng(47)
        a = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=1)
             % 170 + 40).astype(np.uint8)
        flash = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        moved = _shift(a, 2, 1)
        nals = encode_gop([_gray(a), _gray(flash), _gray(moved)],
                          qp=0, pcm_mad=0.0, n_refs=2)
        sps, pps = _cfg(48, 32, n_refs=2)
        st = {}
        outs = decode_gop(nals, sps, pps, stats=st)
        assert st.get("multiref", 0) >= 5, st
        assert np.array_equal(rgb_to_yuv420(outs[0])[0], a)
        assert np.array_equal(rgb_to_yuv420(outs[2])[0], moved)

    def test_three_references_exercise_ue_refidx(self):
        """With 3 active references te(v) falls back to ue(v); content
        two flashes back must still reconstruct exactly from
        ref_idx 2."""
        rng = np.random.default_rng(53)
        a = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=1)
             % 170 + 40).astype(np.uint8)
        f1 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        f2 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        moved = _shift(a, -2, 2)
        nals = encode_gop([_gray(a), _gray(f1), _gray(f2), _gray(moved)],
                          qp=0, pcm_mad=0.0, n_refs=3)
        sps, pps = _cfg(48, 32, n_refs=3)
        st = {}
        outs = decode_gop(nals, sps, pps, stats=st)
        assert st.get("multiref", 0) >= 5, st
        assert np.array_equal(rgb_to_yuv420(outs[3])[0], moved)

    def test_alternating_scenes_gop_bounded_error(self):
        """A GOP alternating two translating scenes at moderate qp:
        multi-ref engages, P NALs stay far below the I NAL, decode
        error stays bounded."""
        rng = np.random.default_rng(59)
        a = (np.cumsum(rng.integers(0, 4, (48, 80)), axis=1)
             % 180 + 30).astype(np.uint8)
        b = (np.cumsum(rng.integers(0, 4, (48, 80)), axis=0)
             % 180 + 30).astype(np.uint8)
        frames = []
        for f in range(6):
            src = a if f % 2 == 0 else b
            frames.append(_gray(_shift(src, 2 * (f // 2), 0)))
        nals = encode_gop(frames, qp=22, pcm_mad=5.0, n_refs=2)
        sps, pps = _cfg(80, 48, n_refs=2)
        st = {}
        outs = decode_gop(nals, sps, pps, stats=st)
        assert st.get("multiref", 0) > 0, st
        # later alternating frames must compress far better than intra
        assert all(len(n) < len(nals[0]) / 2 for n in nals[3:])
        for fr, out in zip(frames, outs):
            recon = yuv420_to_rgb(*rgb_to_yuv420(fr))
            err = np.abs(out.astype(int) - recon.astype(int))
            assert err.mean() < 5.0

    def test_single_ref_stream_unchanged_and_guard(self):
        """n_refs=1 streams never write the override or ref_idx syntax
        (bit-compatible with the single-ref decoder path); a stream
        declaring more active references than the decoder holds fails
        loudly."""
        rng = np.random.default_rng(61)
        a = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=1)
             % 170 + 40).astype(np.uint8)
        moved = _shift(a, 1, 0)
        nals1 = encode_gop([_gray(a), _gray(moved)], qp=0, pcm_mad=0.0)
        nals2 = encode_gop([_gray(a), _gray(moved)], qp=0, pcm_mad=0.0,
                           n_refs=1)
        assert nals1 == nals2
        # a 2-ref stream decoded with only one held reference picture
        rng2 = np.random.default_rng(67)
        flash = rng2.integers(0, 256, (32, 48), dtype=np.uint8)
        nals3 = encode_gop([_gray(a), _gray(flash), _gray(moved)],
                           qp=0, pcm_mad=0.0, n_refs=2)
        sps1, pps1 = _cfg(48, 32, n_refs=2)
        ref = decode_gop(nals3[:2], sps1, pps1)  # decode I + flash
        one_ref = rgb_to_yuv420(ref[1])  # a single planes tuple
        with pytest.raises(ValueError, match="active references"):
            decode_pframe_planes(nals3[2], sps1, pps1, one_ref)
