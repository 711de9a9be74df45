"""Sub-16x16 P partitions (spec Table 7-13 mb_type 1-4): P_16x8 /
P_8x16 / P_8x8 (8x8 sub-blocks) — directional MV prediction, sequential
intra-MB partition prediction, syntax round trips, and exact
reconstruction when each partition's true motion is representable.

The shift helpers sample with edge-clamped indices — EXACTLY the
8.4.2.2.1 clamping motion compensation applies — so a frame built from
per-region shifts of a lossless I_PCM reference can reconstruct
bit-identically with zero residual everywhere, making any predictor or
interpolator disagreement a hard test failure.
"""
import numpy as np

from sparksketch.h264 import (decode_gop, decode_iframe_planes,
                              encode_iframe, encode_pframe, rgb_to_yuv420)
from sparksketch.mp4 import encode_pps, encode_sps, parse_pps, parse_sps


def _cfg(w, h):
    return (parse_sps(encode_sps(w, h, fps=10.0)),
            parse_pps(encode_pps(deblocking_control=True)))


def _gray(p):
    return np.repeat(p[:, :, None], 3, axis=2)


def _shift(img, dx, dy):
    """Sample img at (y + dy, x + dx) with edge clamping — the content
    moves by (-dx, -dy); motion compensation reproduces this exactly
    with mv = (4*dx, 4*dy)."""
    ys = np.clip(np.arange(img.shape[0]) + dy, 0, img.shape[0] - 1)
    xs = np.clip(np.arange(img.shape[1]) + dx, 0, img.shape[1] - 1)
    return img[np.ix_(ys, xs)]


def _roundtrip(base, curr, w, h):
    from sparksketch.h264 import decode_pframe_planes
    inal = encode_iframe(_gray(base), pcm_mad=-1, qp=0)
    sps, pps = _cfg(w, h)
    ref = decode_iframe_planes(inal, sps, pps)
    pnal = encode_pframe(_gray(curr), ref, qp=0, pcm_mad=0.0)
    st = {}  # P-frame stats only (the I frame's MBs are all I_PCM)
    planes = decode_pframe_planes(pnal, sps, pps, ref, st)
    return planes[0], st


class TestPartitionExactness:
    def test_16x8_split_motion_exact(self):
        """Each MB's top 8 rows move +2 px and bottom 8 rows -2 px:
        only a 16x8 partitioning can be residual-free, and the decode
        must be bit-identical through the clamped-shift construction."""
        rng = np.random.default_rng(23)
        base = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=1)
                % 170 + 40).astype(np.uint8)
        curr = np.empty_like(base)
        top, bot = _shift(base, 2, 0), _shift(base, -2, 0)
        for y in range(32):
            curr[y] = top[y] if (y // 8) % 2 == 0 else bot[y]
        got, st = _roundtrip(base, curr, 48, 32)
        assert np.array_equal(got, curr)
        assert st.get("p16x8", 0) >= 5, st
        assert st.get("pcm", 0) == 0, st

    def test_8x16_split_motion_exact(self):
        rng = np.random.default_rng(29)
        base = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=0)
                % 170 + 40).astype(np.uint8)
        curr = np.empty_like(base)
        left, right = _shift(base, 0, 2), _shift(base, 0, -2)
        for x in range(48):
            curr[:, x] = left[:, x] if (x // 8) % 2 == 0 else right[:, x]
        got, st = _roundtrip(base, curr, 48, 32)
        assert np.array_equal(got, curr)
        assert st.get("p8x16", 0) >= 5, st
        assert st.get("pcm", 0) == 0, st

    def test_8x8_quadrant_motion_exact(self):
        """Four distinct motions per MB, one per 8x8 quadrant — only
        P_8x8 can represent it residual-free."""
        rng = np.random.default_rng(31)
        base = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=1)
                % 170 + 40).astype(np.uint8)
        shifts = {(0, 0): (1, 2), (1, 0): (-2, 1),
                  (0, 1): (2, -1), (1, 1): (-1, -2)}
        planes = {k: _shift(base, dx, dy) for k, (dx, dy) in shifts.items()}
        curr = np.empty_like(base)
        for y in range(32):
            for xb in range(48 // 8):
                k = (xb % 2, (y // 8) % 2)
                curr[y, xb * 8:(xb + 1) * 8] = \
                    planes[k][y, xb * 8:(xb + 1) * 8]
        got, st = _roundtrip(base, curr, 48, 32)
        assert np.array_equal(got, curr)
        assert st.get("p8x8", 0) >= 5, st
        assert st.get("pcm", 0) == 0, st

    def test_4x4_subpartition_motion_exact(self):
        """Motion alternating in a 4-px checkerboard: only P_8x8 with
        4x4 (or mixed sub-8x8) sub-partitions can be residual-free."""
        rng = np.random.default_rng(43)
        base = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=1)
                % 170 + 40).astype(np.uint8)
        shifts = {(0, 0): (1, 1), (1, 0): (-1, 1),
                  (0, 1): (1, -1), (1, 1): (-1, -1)}
        planes = {k: _shift(base, dx, dy) for k, (dx, dy) in shifts.items()}
        curr = np.empty_like(base)
        for y in range(32):
            for xb in range(48 // 4):
                k = (xb % 2, (y // 4) % 2)
                curr[y, xb * 4:(xb + 1) * 4] = \
                    planes[k][y, xb * 4:(xb + 1) * 4]
        got, st = _roundtrip(base, curr, 48, 32)
        assert np.array_equal(got, curr)
        assert st.get("p8x8", 0) >= 5, st
        assert st.get("psub", 0) >= 5, st
        assert st.get("pcm", 0) == 0, st

    def test_uniform_motion_still_prefers_16x16(self):
        """When one vector explains the whole MB, the shared J must keep
        the cheap 16x16 shape (finer partitions pay mvd/header bits for
        nothing)."""
        rng = np.random.default_rng(37)
        base = (np.cumsum(rng.integers(0, 3, (32, 48)), axis=1)
                % 170 + 40).astype(np.uint8)
        curr = _shift(base, 2, 1)
        got, st = _roundtrip(base, curr, 48, 32)
        assert np.array_equal(got, curr)
        assert st.get("p16", 0) + st.get("skip", 0) == 6, st
        assert st.get("p16x8", 0) == st.get("p8x16", 0) == 0, st


class TestPartitionGop:
    def test_mixed_partition_scene_bounded_error(self):
        """A scene whose halves shear against each other at moderate qp:
        partitions engage, the stream stays compact, decode error stays
        bounded (the production-path contract)."""
        from sparksketch.h264 import encode_gop, yuv420_to_rgb
        rng = np.random.default_rng(41)
        base = (np.cumsum(rng.integers(0, 4, (48, 80)), axis=1)
                % 180 + 30).astype(np.uint8)
        frames = []
        for f in range(4):
            fr = np.empty_like(base)
            top = _shift(base, 2 * f, 0)
            bot = _shift(base, -2 * f, 0)
            for y in range(48):
                fr[y] = top[y] if (y // 8) % 2 == 0 else bot[y]
            frames.append(_gray(fr))
        nals = encode_gop(frames, qp=22, pcm_mad=5.0)
        assert all(len(n) < len(nals[0]) for n in nals[1:])
        sps, pps = _cfg(80, 48)
        st = {}
        outs = decode_gop(nals, sps, pps, stats=st)
        assert st.get("p16x8", 0) > 0, st
        for fr, out in zip(frames, outs):
            recon = yuv420_to_rgb(*rgb_to_yuv420(fr))
            err = np.abs(out.astype(int) - recon.astype(int))
            assert err.mean() < 5.0
