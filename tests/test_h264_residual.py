"""CAVLC residual layer tests (sparksketch/h264_residual.py).

Three kinds of guarantees:
1. TABLE INTEGRITY — every VLC column of Tables 9-5/9-7/9-8/9-9(a)/9-10
   is a prefix-free COMPLETE code (Kraft sum == 1 where the spec column
   is complete): a single mis-transcribed code length or value breaks
   one of these checks, so the spec tables can't silently drift.
2. ROUND-TRIP — write_* and read_* are exact inverses over exhaustive /
   randomized inputs (all coeff_token pairs x all nC columns, levels
   across the escape boundaries, full residual blocks).
3. NUMERIC EXACTNESS — the single-shift dequant forms equal the spec's
   two-branch 8.5.10/8.5.12.1 formulas (flat scaling lists) for every
   qp in [0, 51], and encode->decode through sparksketch.h264 stays
   within the quantization error bound at several QPs.
"""
import numpy as np
import pytest

from sparksketch import h264_residual as hr
from sparksketch.h264 import decode_iframe, encode_iframe, rgb_to_yuv420, \
    yuv420_to_rgb
from sparksketch.mp4 import _BitReader, _BitWriter, encode_pps, encode_sps, \
    parse_pps, parse_sps


def _bits_to_bytes(bits):
    bits = list(bits) + [0] * (((-len(bits)) % 8) + 8)
    return bytes(sum(b << (7 - i) for i, b in enumerate(bits[o:o + 8]))
                 for o in range(0, len(bits), 8))


def _codes(len_tab, cod_tab, max_tc):
    out = []
    for t1 in range(len(len_tab)):
        for tc in range(max_tc + 1):
            ln = len_tab[t1][tc]
            if ln:
                out.append((ln, cod_tab[t1][tc]))
    return out


def _assert_prefix_free(codes, deficit=0.0):
    """Prefix-freeness + an EXACT Kraft sum.  The spec's luma
    coeff_token columns (and the tz_vlc row for TotalCoeff 1) are
    deliberately one-leaf short of complete — the unused leaf is the
    all-zeros codeword subtree, avoided for resync robustness — so the
    expected deficit is part of the contract: any single
    mis-transcribed length or value moves the sum or breaks
    prefix-freeness."""
    seen = set()
    for ln, code in codes:
        assert code < (1 << ln)
        bits = format(code, f"0{ln}b")
        assert bits not in seen
        seen.add(bits)
        assert code != 0 or deficit == 0.0 or ln < 3, \
            "all-zeros codeword used in a deficit column"
    for a in seen:
        for b in seen:
            if a is not b:
                assert not b.startswith(a) or a == b, (a, b)
    kraft = sum(2.0 ** -len(b) for b in seen)
    assert kraft == pytest.approx(1.0 - deficit, abs=1e-15)


class TestTables:
    def test_coeff_token_columns_exact(self):
        # each Table 9-5 VLC column is a prefix code over the 62
        # (T1, TC) pairs; luma columns leave exactly one all-zeros
        # subtree unused (2^-15 / 2^-13 / 2^-10), chroma DC is complete
        for col, deficit in ((0, 2.0 ** -15), (1, 2.0 ** -13),
                             (2, 2.0 ** -10)):
            _assert_prefix_free(
                _codes(hr._CT_LEN[col], hr._CT_COD[col], 16), deficit)
        _assert_prefix_free(_codes(hr._CT_CDC_LEN, hr._CT_CDC_COD, 4))

    def test_total_zeros_rows_exact(self):
        for tc in range(1, 16):
            lens, cods = hr._TZ_LEN[tc - 1], hr._TZ_COD[tc - 1]
            assert len(lens) == 16 - tc + 1 == len(cods)
            _assert_prefix_free(list(zip(lens, cods)),
                                deficit=2.0 ** -9 if tc == 1 else 0.0)
        for tc in range(1, 4):
            lens, cods = hr._TZ_CDC_LEN[tc - 1], hr._TZ_CDC_COD[tc - 1]
            assert len(lens) == 4 - tc + 1 == len(cods)
            _assert_prefix_free(list(zip(lens, cods)))

    def test_run_before_rows_complete(self):
        for zl in range(1, 7):
            lens = hr._RUN_LEN[zl - 1]
            cods = hr._RUN_COD[zl - 1]
            assert len(lens) == zl + 1
            _assert_prefix_free(list(zip(lens, cods)))

    def test_coeff_token_roundtrip_exhaustive(self):
        # every legal (T1, TC) through every nC column
        for nc in (-1, 0, 1, 2, 3, 4, 7, 8, 30):
            max_tc = 4 if nc == -1 else 16
            for tc in range(max_tc + 1):
                for t1 in range(min(3, tc) + 1):
                    w = _BitWriter()
                    hr.write_coeff_token(w, nc, t1, tc)
                    r = _BitReader(_bits_to_bytes(w.bits))
                    assert hr.read_coeff_token(r, nc) == (t1, tc)

    def test_flc_invalid_value_rejected(self):
        w = _BitWriter()
        w.u(2, 6)  # 4*(tc-1)+t1 = 2 -> tc=1, t1=2 > tc: illegal
        r = _BitReader(_bits_to_bytes(w.bits))
        with pytest.raises(ValueError):
            hr.read_coeff_token(r, 8)


class TestLevels:
    @pytest.mark.parametrize("t1,tc", [(0, 1), (1, 2), (3, 5), (2, 11),
                                       (0, 16), (3, 16)])
    def test_levels_roundtrip_random(self, t1, tc):
        rng = np.random.default_rng(t1 * 100 + tc)
        for trial in range(200):
            levels = []
            for i in range(tc):
                if i < t1:
                    levels.append(int(rng.choice([-1, 1])))
                else:
                    mag = int(rng.integers(1, 2000))
                    if i == t1 and t1 < 3:
                        mag = max(2, mag)  # first non-T1 level: |l| >= 2
                    levels.append(mag * int(rng.choice([-1, 1])))
            w = _BitWriter()
            hr.write_levels(w, levels, t1, tc)
            r = _BitReader(_bits_to_bytes(w.bits))
            assert hr.read_levels(r, t1, tc) == levels

    def test_levels_escape_boundaries(self):
        # exercise prefix 13/14/15/16+ transitions at suffixLength 0..2
        for mag in (7, 8, 15, 16, 17, 30, 31, 2047, 2048, 2063, 2064,
                    4095, 4096, 10000, 100000):
            for sign in (1, -1):
                levels = [3, sign * mag]  # first level |3| avoids T1
                w = _BitWriter()
                hr.write_levels(w, levels, 0, 2)
                r = _BitReader(_bits_to_bytes(w.bits))
                assert hr.read_levels(r, 0, 2) == levels


class TestResidualBlock:
    @pytest.mark.parametrize("max_coeff,nc", [(16, 0), (15, 2), (15, 5),
                                              (16, 9), (4, -1)])
    def test_block_roundtrip_random(self, max_coeff, nc):
        rng = np.random.default_rng(max_coeff * 10 + nc)
        for density in (0.0, 0.1, 0.3, 0.7, 1.0):
            for trial in range(60):
                coeffs = np.where(
                    rng.random(max_coeff) < density,
                    rng.integers(-40, 41, size=max_coeff), 0
                ).astype(np.int64)
                w = _BitWriter()
                tc = hr.write_residual_block(w, coeffs, nc)
                assert tc == int(np.count_nonzero(coeffs))
                r = _BitReader(_bits_to_bytes(w.bits))
                got, tc2 = hr.read_residual_block(r, nc, max_coeff)
                assert tc2 == tc
                assert np.array_equal(got, coeffs)

    def test_scan_matrix_roundtrip(self):
        rng = np.random.default_rng(0)
        m = rng.integers(-9, 9, size=(4, 4)).astype(np.int64)
        assert np.array_equal(hr.scan_to_mat(hr.mat_to_scan(m)), m)
        ac = hr.mat_to_scan(m, offset=1)
        back = hr.scan_to_mat(ac, offset=1)
        m0 = m.copy()
        m0[0, 0] = 0
        assert np.array_equal(back, m0)


class TestDequantExactness:
    def test_ac_single_shift_equals_spec_branches(self):
        # 8.5.12.1 with LevelScale = 16*v: both branches == c*v << (qp//6)
        rng = np.random.default_rng(1)
        c = rng.integers(-500, 501, size=(4, 4)).astype(np.int64)
        for qp in range(52):
            v = np.array(hr._V[qp % 6], dtype=np.int64)[hr._POS_CLS]
            if qp >= 24:
                spec = (c * 16 * v) << (qp // 6 - 4)
            else:
                spec = (c * 16 * v + (1 << (3 - qp // 6))) >> (4 - qp // 6)
            assert np.array_equal(hr.dequant4x4_ac(c, qp), spec)

    def test_dc_luma_equals_spec_branches(self):
        rng = np.random.default_rng(2)
        c = rng.integers(-500, 501, size=(4, 4)).astype(np.int64)
        for qp in range(52):
            fD = hr._CI @ c @ hr._CI
            v = hr._V[qp % 6][0]
            if qp >= 36:
                spec = (fD * 16 * v) << (qp // 6 - 6)
            else:
                spec = (fD * 16 * v + (1 << (5 - qp // 6))) \
                    >> (6 - qp // 6)
            assert np.array_equal(hr.dequant_dc_luma(c, qp), spec)

    def test_inv4x4_matches_float_dct_shape(self):
        # the integer inverse of the forward transform recovers the
        # residual within the transform's own rounding bound: for
        # UNQUANTIZED coefficients scaled per the norm (fwd then exact
        # inverse with the /64 folded), a pure-DC input is exact
        d = np.zeros((4, 4), dtype=np.int64)
        d[0, 0] = 64 * 4  # dequantized DC for a flat residual of +4
        res = hr.inv4x4(d)
        assert np.array_equal(res, np.full((4, 4), 4))

    def test_chroma_qp_table(self):
        assert hr.chroma_qp(26, 0) == 26
        assert hr.chroma_qp(29, 0) == 29
        assert hr.chroma_qp(30, 0) == 29
        assert hr.chroma_qp(39, 0) == 35
        assert hr.chroma_qp(51, 0) == 39
        assert hr.chroma_qp(51, 12) == 39   # clamped at 51
        assert hr.chroma_qp(0, -7) == 0     # clamped at 0


def _cfg(w, h):
    sps = encode_sps(w, h, fps=10.0)
    pps = encode_pps(deblocking_control=True)
    return parse_sps(sps), parse_pps(pps)


def _recon_420(rgb):
    return yuv420_to_rgb(*rgb_to_yuv420(rgb))


class TestEndToEndResidual:
    def test_noise_residual_coding_within_quant_bound(self):
        # pure noise: prediction alone is hopeless (MAD ~64), but
        # residual coding at qp=28 lands within the quantization bound
        # (pcm_mad=64 forces every MB through the residual path)
        rgb = np.random.default_rng(3).integers(
            0, 256, size=(32, 48, 3), dtype=np.uint8)
        sps, pps = _cfg(48, 32)
        nal = encode_iframe(rgb, pcm_mad=64.0, qp=28)
        out = decode_iframe(nal, sps, pps)
        err = np.abs(out.astype(int) - _recon_420(rgb).astype(int))
        assert err.mean() < 14.0

    @pytest.mark.parametrize("qp,bound", [(4, 1.2), (16, 2.5), (28, 7.0),
                                          (40, 24.0)])
    def test_quality_tracks_qp(self, qp, bound):
        # textured but correlated content through the full residual path
        rng = np.random.default_rng(qp)
        base = np.cumsum(rng.integers(-6, 7, size=(48, 64, 3)), axis=1)
        rgb = np.clip(base + 128, 0, 255).astype(np.uint8)
        sps, pps = _cfg(64, 48)
        nal = encode_iframe(rgb, pcm_mad=64.0, qp=qp)
        out = decode_iframe(nal, sps, pps)
        err = np.abs(out.astype(int) - _recon_420(rgb).astype(int)).mean()
        assert err < bound, (qp, err)

    def test_lower_qp_never_bigger_error(self):
        rng = np.random.default_rng(9)
        base = np.cumsum(rng.integers(-5, 6, size=(32, 32, 3)), axis=0)
        rgb = np.clip(base + 128, 0, 255).astype(np.uint8)
        sps, pps = _cfg(32, 32)
        errs = []
        for qp in (8, 20, 32, 44):
            out = decode_iframe(
                encode_iframe(rgb, pcm_mad=64.0, qp=qp), sps, pps)
            errs.append(
                np.abs(out.astype(int) - _recon_420(rgb).astype(int)).mean())
        assert errs == sorted(errs), errs

    def test_decoder_matches_encoder_recon_with_residuals(self):
        # the standing codec contract, now through the residual path:
        # re-encoding the DECODED frame losslessly is a fixpoint
        rng = np.random.default_rng(11)
        base = np.cumsum(rng.integers(-4, 5, size=(48, 48, 3)), axis=1)
        rgb = np.clip(base + 100, 0, 255).astype(np.uint8)
        sps, pps = _cfg(48, 48)
        out1 = decode_iframe(encode_iframe(rgb, pcm_mad=9.0, qp=24),
                             sps, pps)
        out2 = decode_iframe(encode_iframe(out1, pcm_mad=0.0), sps, pps)
        assert np.array_equal(_recon_420(out1), out2)

    def test_mb_qp_delta_tracked(self):
        # hand-build a two-MB slice: MB 1 carries NO residual (so its
        # reconstruction is the flat 128 DC prediction at any QP) and
        # MB 2 carries a +9 residual quantized at qp=10, reached from
        # the slice QP 40 via mb_qp_delta = -30.  A decoder that ignored
        # the delta would dequantize MB 2's (fine-step, large) levels
        # with the coarse qp=40 step and land wildly off.
        from sparksketch.h264 import _CoeffCtx, _write_i16_residual
        from sparksketch.mp4 import _BitWriter
        sps, pps = _cfg(32, 16)
        w = _BitWriter()
        w.ue(0)        # first_mb_in_slice
        w.ue(7)        # slice_type I
        w.ue(0)        # pps id
        w.u(0, 8)      # frame_num
        w.ue(0)        # idr_pic_id
        w.u(0, 8)      # poc lsb
        w.u(0, 1)      # no_output_of_prior_pics
        w.u(0, 1)      # long_term_reference
        w.se(40 - 26)  # slice QP 40
        w.ue(1)        # deblocking off
        ctx = _CoeffCtx(2, 1)
        z2 = np.zeros((2, 2), np.int64)
        zac = [np.zeros(15, np.int64)] * 4
        # MB 1: DC mode, zero residual (cbp 0, all-zero DC block)
        w.ue(1 + 2)    # mb_type: I_16x16 DC, cbp_luma 0, cbp_chroma 0
        w.ue(0)        # chroma DC mode
        w.se(0)        # mb_qp_delta
        _write_i16_residual(w, ctx, 0, 0, np.zeros((4, 4), np.int64),
                            None, 0, z2, None, z2, None, 0)
        # MB 2: +9 residual on the 128 DC prediction, quantized at 10
        pred = np.full((16, 16), 128, np.int64)
        dcL, acL = hr.transform_quant_luma16(pred + 9, pred, 10)
        cbp_luma = 15 if any(a.any() for a in acL) else 0
        w.ue(1 + 2 + (12 if cbp_luma else 0))
        w.ue(0)
        w.se(-30)      # mb_qp_delta: QP 40 -> 10
        _write_i16_residual(w, ctx, 1, 0, dcL, acL, cbp_luma,
                            z2, None, z2, None, 0)
        nal = bytes([0x65]) + w.rbsp()
        out = decode_iframe(nal, sps, pps)
        y = rgb_to_yuv420(out)[0]
        assert float(np.abs(y[:, :16].astype(int) - 128).mean()) == 0.0
        assert abs(float(y[:, 16:].mean()) - 137.0) < 1.0
