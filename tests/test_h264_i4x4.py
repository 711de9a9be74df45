"""Intra_4x4 tests (sparksketch/h264.py: _pred_luma4, mode signalling,
Table 9-4 cbp mapping, full encode/decode through the CAVLC residual
layer).

The decisive contract stays the repo's standing one: the decoder
reconstructs BIT-IDENTICALLY what the encoder reconstructed; on top of
that, spec-point tests pin the 9 prediction mode formulas, the decode-
order availability rules (block 3/7/11/13/15 top-right pattern), and the
most-probable-mode signalling.
"""
import numpy as np
import pytest

from sparksketch.h264 import (_CBP_INTRA, _CBP_INTRA_INV,
                              _most_probable_i4_mode, _pred_luma4,
                              decode_iframe, encode_iframe, rgb_to_yuv420,
                              yuv420_to_rgb)
from sparksketch.mp4 import encode_pps, encode_sps, parse_pps, parse_sps


def _cfg(w, h):
    return (parse_sps(encode_sps(w, h, fps=10.0)),
            parse_pps(encode_pps(deblocking_control=True)))


def _recon_420(rgb):
    return yuv420_to_rgb(*rgb_to_yuv420(rgb))


class TestCbpTable:
    def test_permutation(self):
        assert sorted(_CBP_INTRA) == list(range(48))
        for code, cbp in enumerate(_CBP_INTRA):
            assert _CBP_INTRA_INV[cbp] == code

    def test_spec_anchors(self):
        # Table 9-4 intra column anchors: codeNum 0 -> 47 (everything
        # coded), 3 -> 0 (nothing coded), 2 -> 15 (luma only)
        assert _CBP_INTRA[0] == 47
        assert _CBP_INTRA[3] == 0
        assert _CBP_INTRA[2] == 15
        assert _CBP_INTRA[1] == 31


class TestPredModes:
    def _full_ctx(self):
        # a reconstructed plane with distinct values and everything
        # decoded, so all 9 modes are available at an interior block
        rng = np.random.default_rng(0)
        rec = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        decoded = np.ones((4, 4), dtype=bool)
        return rec, decoded

    def test_all_nine_available_interior(self):
        rec, decoded = self._full_ctx()
        preds = _pred_luma4(rec, 4, 4, decoded)
        assert set(preds) == set(range(9))
        for m, p in preds.items():
            assert p.shape == (4, 4) and p.dtype == np.uint8

    def test_top_left_corner_dc_only(self):
        rec, _ = self._full_ctx()
        decoded = np.zeros((4, 4), dtype=bool)
        preds = _pred_luma4(rec, 0, 0, decoded)
        assert set(preds) == {2}
        assert preds[2][0, 0] == 128

    def test_availability_top_only(self):
        rec, _ = self._full_ctx()
        decoded = np.zeros((4, 4), dtype=bool)
        decoded[0, :] = True  # the row above block (1,1)... block (0,1)
        preds = _pred_luma4(rec, 4, 4, decoded)
        # top + top-right decoded, no left: V, DC, DDL, VL
        assert set(preds) == {0, 2, 3, 7}

    def test_availability_left_only(self):
        rec, _ = self._full_ctx()
        decoded = np.zeros((4, 4), dtype=bool)
        decoded[:, 0] = True
        preds = _pred_luma4(rec, 4, 4, decoded)
        # left only: H, DC, HU
        assert set(preds) == {1, 2, 8}

    def test_vertical_and_horizontal_exact(self):
        rec, decoded = self._full_ctx()
        preds = _pred_luma4(rec, 4, 4, decoded)
        assert np.array_equal(preds[0],
                              np.broadcast_to(rec[3, 4:8], (4, 4)))
        assert np.array_equal(preds[1],
                              np.broadcast_to(rec[4:8, 3][:, None],
                                              (4, 4)))

    def test_dc_exact(self):
        rec, decoded = self._full_ctx()
        preds = _pred_luma4(rec, 4, 4, decoded)
        want = (int(rec[3, 4:8].sum()) + int(rec[4:8, 3].sum()) + 4) >> 3
        assert (preds[2] == want).all()

    def test_ddl_flat_is_flat(self):
        # flat neighborhood -> every directional mode predicts flat
        rec = np.full((16, 16), 77, dtype=np.uint8)
        decoded = np.ones((4, 4), dtype=bool)
        preds = _pred_luma4(rec, 4, 4, decoded)
        for m in range(9):
            assert (preds[m] == 77).all(), m

    def test_topright_substitution(self):
        # top decoded but top-right not: p[4..7,-1] must replicate
        # p[3,-1] (spec 8.3.1.2), so DDL's bottom-right corner equals it
        rec = np.zeros((16, 16), dtype=np.uint8)
        rec[3, 4:8] = [10, 20, 30, 40]
        decoded = np.zeros((4, 4), dtype=bool)
        decoded[0, 1] = True   # only the block directly above
        preds = _pred_luma4(rec, 4, 4, decoded)
        assert preds[3][3, 3] == 40  # (t6 + 3*t7 + 2) >> 2 with t6=t7=40

    def test_most_probable_mode_rules(self):
        modes = np.full((4, 4), -1, dtype=np.int8)
        assert _most_probable_i4_mode(modes, 0, 0) == 2  # none -> DC
        modes[0, 0] = 7
        assert _most_probable_i4_mode(modes, 1, 0) == 2  # up missing->DC
        modes[0, 1] = 5
        modes[1, 0] = 0
        assert _most_probable_i4_mode(modes, 1, 1) == 0  # min(left=0,up=5)


class TestEndToEnd:
    def test_i4_roundtrip_detailed_content(self):
        # fine texture: Intra_4x4 beats one 16x16 prediction; the frame
        # must decode bit-identically to the encoder's reconstruction
        rng = np.random.default_rng(5)
        base = np.cumsum(np.cumsum(
            rng.integers(-3, 4, size=(48, 48, 3)), axis=0), axis=1) % 160
        rgb = (base + 40).astype(np.uint8)
        sps, pps = _cfg(48, 48)
        nal = encode_iframe(rgb, pcm_mad=6.0, qp=20)
        out1 = decode_iframe(nal, sps, pps)
        err = np.abs(out1.astype(int) - _recon_420(rgb).astype(int)).mean()
        assert err <= 6.5  # pcm_mad bound (+ chroma upsample slop)
        # fixpoint: lossless re-encode of the decode reproduces it
        out2 = decode_iframe(encode_iframe(out1, pcm_mad=0.0), sps, pps)
        assert np.array_equal(_recon_420(out1), out2)

    def test_i4_actually_chosen_and_smaller(self):
        # content engineered so single-direction 16x16 prediction fails
        # but per-block 4x4 direction tracking succeeds: diagonal bands.
        # The decoder's own mb_type census must show Intra_4x4 MBs (the
        # rate-aware mode decision picked them), and the stream beats
        # the forced-PCM baseline by 2x
        from sparksketch.h264 import decode_iframe_planes
        y, x = np.mgrid[0:32, 0:32]
        # short-period diagonal sawtooth: constant along anti-diagonals
        # (Intra_4x4 DDL territory) but with 4 wraps per MB, so the
        # Intra_16x16 Plane mode can't fit it
        rgb = np.stack([((x + y) * 6 % 48 + 100).astype(np.uint8)] * 3, -1)
        sps, pps = _cfg(32, 32)
        # qp 26: lambda_mode is large enough that the rate term
        # separates the candidates (at low qp both recon near-exactly
        # and the tie goes to I16)
        nal = encode_iframe(rgb, pcm_mad=4.0, qp=26)
        raw = encode_iframe(rgb, pcm_mad=-1.0)
        assert len(nal) < len(raw) / 2
        census = {}
        decode_iframe_planes(nal, sps, pps, stats=census)
        assert census.get("i4", 0) > 0, census
        out = decode_iframe(nal, sps, pps)
        assert np.abs(out.astype(int)
                      - _recon_420(rgb).astype(int)).mean() < 5.0

    @pytest.mark.parametrize("qp", [6, 18, 30, 42])
    def test_fixpoint_across_qp(self, qp):
        rng = np.random.default_rng(qp)
        rgb = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        sps, pps = _cfg(32, 32)
        out1 = decode_iframe(encode_iframe(rgb, pcm_mad=64.0, qp=qp),
                             sps, pps)
        out2 = decode_iframe(encode_iframe(out1, pcm_mad=0.0), sps, pps)
        assert np.array_equal(_recon_420(out1), out2)

    def test_mixed_mb_types_in_one_frame(self):
        # smooth gradient (I_16x16 wins) + textured quadrant (I_4x4
        # wins) + incompressible noise at tight pcm_mad (PCM wins):
        # all three MB types coexist and the stream decodes
        yy, xx = np.mgrid[0:48, 0:48]
        rgb = np.stack([(yy + xx).astype(np.uint8)] * 3, -1).copy()
        rng = np.random.default_rng(8)
        rgb[16:32, 0:16] = ((xx[:16, :16] * yy[:16, :16] * 7) % 200
                            )[..., None].astype(np.uint8)
        rgb[32:48, 32:48] = rng.integers(0, 256, (16, 16, 3), np.uint8)
        sps, pps = _cfg(48, 48)
        nal = encode_iframe(rgb, pcm_mad=1.2, qp=24)
        out = decode_iframe(nal, sps, pps)
        # the noise MB went PCM and is exact in 4:2:0 space
        assert np.array_equal(out[32:48, 32:48],
                              _recon_420(rgb)[32:48, 32:48])
        out2 = decode_iframe(encode_iframe(out, pcm_mad=0.0), sps, pps)
        assert np.array_equal(_recon_420(out), out2)
