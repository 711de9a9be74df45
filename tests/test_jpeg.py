"""Pure-NumPy baseline JPEG codec (sparksketch/jpeg.py): round-trip
accuracy, 4:2:0 subsampling, marker/structure validity, malformed-input
fail-fast, and the distributed round-trip pipeline."""

import numpy as np
import pytest

from sparksketch.jpeg import ZIGZAG, decode_jpeg, encode_jpeg


def _gradient(h=48, w=64, offset=0):
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    return np.clip(offset + y * 2 + x + c * 40, 0, 255).astype(np.uint8)


class TestCodec:
    def test_zigzag_is_a_permutation(self):
        assert sorted(ZIGZAG.tolist()) == list(range(64))

    @pytest.mark.parametrize("subsample", [False, True])
    def test_gradient_roundtrip_tight(self, subsample):
        px = _gradient()
        out = decode_jpeg(encode_jpeg(px, quality=90, subsample=subsample))
        err = np.abs(out.astype(float) - px.astype(float))
        assert out.shape == px.shape
        assert err.mean() <= 1.0
        assert err.max() <= 16

    def test_flat_image_is_exact(self):
        px = np.full((16, 24, 3), 77, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(px, 85)) == px).all()

    def test_odd_dimensions(self):
        px = _gradient(19, 21)
        out = decode_jpeg(encode_jpeg(px, quality=90, subsample=True))
        assert out.shape == (19, 21, 3)
        assert np.abs(out.astype(float) - px).mean() <= 2.0

    def test_noise_bounded_error_high_quality(self):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=95))
        # noise is the worst case for DCT coding; at q95 the luma error
        # stays small and chroma bounded by its coarser quant table
        assert np.abs(out.astype(float) - px.astype(float)).mean() <= 12

    def test_deterministic_bytes(self):
        px = _gradient()
        assert encode_jpeg(px, 85) == encode_jpeg(px, 85)

    def test_structure_markers(self):
        blob = encode_jpeg(_gradient(), 85)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in blob[:32]

    def test_quality_monotonic_size(self):
        px = np.random.default_rng(1).integers(
            0, 256, size=(32, 32, 3), dtype=np.uint8)
        sizes = [len(encode_jpeg(px, q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_malformed_inputs_fail_fast(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg")
        with pytest.raises(ValueError):
            decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan
        blob = encode_jpeg(_gradient(16, 16), 85)
        with pytest.raises(ValueError):
            decode_jpeg(blob[:len(blob) // 2])  # truncated mid-stream

    def test_restart_intervals_roundtrip(self):
        px = _gradient(48, 64)
        blob = encode_jpeg(px, quality=90, restart_interval=2)
        assert b"\xff\xdd" in blob  # DRI segment present
        assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
        out = decode_jpeg(blob)
        assert np.abs(out.astype(float) - px.astype(float)).mean() <= 1.0

    def test_restart_with_subsampling(self):
        px = _gradient(33, 49)
        out = decode_jpeg(encode_jpeg(px, quality=90, subsample=True,
                                      restart_interval=1))
        assert np.abs(out.astype(float) - px.astype(float)).mean() <= 2.0

    def test_grayscale_stream(self):
        g = _gradient(24, 40)[..., 0]
        out = decode_jpeg(encode_jpeg(g, quality=95, gray=True))
        assert out.shape == (24, 40, 3)
        # decoder replicates the single luma plane to all three channels
        assert (out[..., 0] == out[..., 1]).all()
        assert np.abs(out[..., 0].astype(float) - g.astype(float)).mean() \
            <= 1.0

    def test_unsupported_sof_rejected_not_garbled(self):
        blob = bytearray(encode_jpeg(_gradient(16, 16), 85))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
        with pytest.raises(ValueError, match="unsupported SOF"):
            decode_jpeg(bytes(blob))


class TestProgressive:
    """SOF2 progressive mode (T.81 Annex G): spectral selection +
    successive approximation.  The progressive stream carries the SAME
    quantized coefficients as the baseline stream, so the decoded pixels
    must be IDENTICAL — a bit-exact contract no approximate check could
    fake."""

    @pytest.mark.parametrize("shape,kw", [
        ((48, 64), {}),
        ((13, 21), {}),                      # ragged, partial MCUs
        ((48, 64), {"subsample": True}),     # 4:2:0
        ((21, 19), {"subsample": True}),     # 4:2:0 + padding block rows
        ((16, 16), {"gray": True}),
        ((40, 40), {"quality": 50}),
    ])
    def test_identical_to_baseline(self, shape, kw):
        rng = np.random.default_rng(11)
        h, w = shape
        grad = _gradient(h, w)
        noise = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        px = np.where(np.arange(w)[None, :, None] < w // 2, grad, noise)
        base = decode_jpeg(encode_jpeg(px, **kw))
        prog = decode_jpeg(encode_jpeg(px, progressive=True, **kw))
        assert np.array_equal(base, prog)

    def test_stream_structure(self):
        blob = encode_jpeg(_gradient(32, 32), progressive=True)
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
        # 1 DC first + 2 bands x 3 comps AC first + 1 DC refine
        # + 2 bands x 3 comps AC refine = 14 scans
        assert blob.count(b"\xff\xda") == 14
        gray = encode_jpeg(_gradient(16, 16)[..., 0], gray=True,
                           progressive=True)
        assert gray.count(b"\xff\xda") == 6

    def test_flat_image_long_eob_runs(self):
        # every AC band is all-zero -> the whole component collapses to
        # one EOBn run across all its blocks; flat images decode exactly
        px = np.full((64, 80, 3), 133, dtype=np.uint8)
        blob = encode_jpeg(px, progressive=True)
        assert np.array_equal(decode_jpeg(blob), px)
        # the 80 blocks/component of each AC FIRST scan fold into a
        # single EOBn symbol (refine scans emit per-block EOBs by design)
        import re
        offs = [m.start() for m in re.finditer(b"\xff\xda", blob)]
        ac_first_sizes = [offs[i + 1] - offs[i] for i in range(1, 7)]
        assert all(sz < 16 for sz in ac_first_sizes), ac_first_sizes

    def test_ac_refine_unit_adversarial_patterns(self):
        """Drive the refinement encoder/decoder pair directly on the
        bands where the correction-bit ordering is subtle: long zero runs
        around already-nonzero coefficients (ZRL + buffered-bit flush),
        trailing corrections folding into EOB, adjacent newly-significant
        values."""
        from sparksketch.jpeg import (_ENC_AC, _BitReader, _BitWriter,
                                      _ac_refine_block,
                                      _write_prog_ac_refine)
        dec_tab = {(c, ln): s for s, (c, ln) in _ENC_AC.items()}

        def roundtrip(band):
            band = np.asarray(band, dtype=np.int64)
            zz = np.zeros((1, 1, 64), dtype=np.int64)
            zz[0, 0, 1:1 + band.size] = band
            w = _BitWriter()
            _write_prog_ac_refine(w, zz, 1, 1, 1, band.size, 0)
            w.flush()
            blk = np.zeros(64, dtype=np.int64)  # decoder state at Al=1
            blk[1:1 + band.size] = np.sign(band) * (
                (np.abs(band) >> 1) << 1)
            r = _BitReader(bytes(w.out), 0)
            _ac_refine_block(r, dec_tab, blk, 1, band.size, 0, 0)
            assert np.array_equal(blk[1:1 + band.size], band), band

        z = [0]
        roundtrip(z * 20 + [1])                # run > 15 before newly-sig
        roundtrip(z * 17 + [6] + z * 3 + [-1])  # ZRL + buffered bit flush
        roundtrip([5, -4, 1, -1, 1])           # corrections + adjacent new
        roundtrip([1] + z * 30 + [7])          # trailing t>1 folds to EOB
        roundtrip(z * 40 + [-5])               # only corrections, no new
        roundtrip(z * 63)                      # empty band -> bare EOB
        rng = np.random.default_rng(23)
        for _ in range(200):
            band = rng.integers(-9, 10, size=63)
            band[rng.random(63) < 0.8] = 0
            roundtrip(band)

    def test_truncated_progressive_fails_fast(self):
        blob = encode_jpeg(_gradient(32, 32), progressive=True)
        with pytest.raises(ValueError):
            decode_jpeg(blob[:len(blob) // 3])


class TestAviMjpeg:
    def _frames(self, n=5, offset=7):
        y = np.arange(16)[:, None, None]
        x = np.arange(16)[None, :, None]
        c = np.arange(3)[None, None, :]
        return [((offset + f * 8) + y * 2 + x + c * 40).astype(np.uint8)
                for f in range(n)]

    def test_container_roundtrip(self):
        from sparksketch.multimodal import decode_avi_mjpeg, encode_avi_mjpeg
        frames = self._frames()
        blob = encode_avi_mjpeg(frames, fps=10)
        fb, usec = decode_avi_mjpeg(blob)
        assert len(fb) == 5 and usec == 100_000
        for f, b in enumerate(fb):
            px = decode_jpeg(b)
            assert np.abs(px.astype(float)
                          - frames[f].astype(float)).mean() <= 0.5

    def test_malformed_avi_fails_fast(self):
        from sparksketch.multimodal import decode_avi_mjpeg, encode_avi_mjpeg
        with pytest.raises(ValueError):
            decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")
        blob = encode_avi_mjpeg(self._frames(2))
        with pytest.raises(ValueError):
            decode_avi_mjpeg(blob[:len(blob) - 40])  # truncated chunk

    def test_sample_video_frames_real_and_stub_tiers(self, spark):
        import pandas as pd
        from sparksketch.multimodal import (encode_avi_mjpeg,
                                            sample_video_frames)
        avi = encode_avi_mjpeg(self._frames(), fps=10)
        pdf = pd.DataFrame({
            "media_id": [1, 2], "kind": ["video", "video"],
            "payload": [avi, b"\x1aE\xdf\xa3matroska-opaque-container"],
            "mime": ["video/x-msvideo", "video/webm"],
            "duration_ms": [500, 400]})
        df = spark.createDataFrame(pdf)
        real = sample_video_frames(df.filter("media_id = 1"),
                                   every_ms=200).collect()
        assert [(r.frame_idx, r.ts_ms) for r in real] == \
            [(0, 0), (2, 200), (4, 400)]
        px = decode_jpeg(bytes(real[1].frame))
        assert abs(float(px[..., 0].mean()) - (7 + 16 + 22.5)) <= 1.0
        # unknown container: honest stub tier
        with pytest.raises(Exception):
            sample_video_frames(df.filter("media_id = 2"),
                                every_ms=200).collect()
        fake = sample_video_frames(df.filter("media_id = 2"), every_ms=200,
                                   fake=True).collect()
        assert len(fake) == 2

pytestmark_spark = pytest.mark.spark


class TestDispatchAndPipeline:
    pytestmark = pytest.mark.spark

    def test_decode_image_dispatches_jpeg(self):
        from sparksketch.multimodal import decode_image
        px = _gradient()
        out = decode_image(encode_jpeg(px, 95), "image/jpeg")
        assert np.abs(out.astype(float) - px).mean() <= 0.5

    def test_distributed_roundtrip_all_ok(self, spark):
        from sparksketch.multimodal import jpeg_roundtrip_features
        rows = jpeg_roundtrip_features(spark, n=12, partitions=3).collect()
        assert len(rows) == 12
        assert all(r.shape_ok and r.mean_err_ok for r in rows)
        assert all(r.jpeg_bytes > 100 for r in rows)

    def test_image_features_on_jpeg_payloads(self, spark):
        """image_features runs unchanged on a JPEG media table — the
        decode dispatch makes the pipeline codec-agnostic."""
        import pandas as pd
        from sparksketch.multimodal import image_features
        pdf = pd.DataFrame({
            "media_id": [1, 2],
            "kind": ["image", "image"],
            "payload": [encode_jpeg(_gradient(offset=i), 95)
                        for i in (0, 8)],
            "mime": ["image/jpeg", "image/jpeg"],
        })
        df = spark.createDataFrame(pdf)
        got = {r.media_id: r for r in image_features(df).collect()}
        for i, mid in ((0, 1), (8, 2)):
            want = _gradient(offset=i).astype(np.float64)
            assert abs(got[mid].mean_r - want[..., 0].mean()) <= 1.0
            assert abs(got[mid].mean_g - want[..., 1].mean()) <= 1.0


class TestMp4Container:
    """ISO BMFF parser (sparksketch/mp4.py): box walk + sample tables.
    The builder crafts a spec-conformant minimal MP4 with a known sample
    layout; recovering each frame's exact bytes from (offset, size)
    proves the stsc/stco/stsz/stts math, not just field parsing."""

    @staticmethod
    def _box(kind, body):
        import struct
        return struct.pack(">I", 8 + len(body)) + kind + body

    def _minimal_mp4(self):
        import struct
        B = self._box
        frames = [bytes([65 + i]) * (10 + 3 * i) for i in range(6)]
        # two chunks of 3 samples, junk gap between chunks
        chunk1 = b"".join(frames[:3])
        chunk2 = b"".join(frames[3:])
        ftyp = B(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        mdat_body = b"\xEE" * 5 + chunk1 + b"\xEE" * 9 + chunk2
        off1 = len(ftyp) + 8 + 5
        off2 = off1 + len(chunk1) + 9
        mdat = B(b"mdat", mdat_body)

        def full(kind, ver, body):
            return B(kind, bytes([ver, 0, 0, 0]) + body)

        stsd_entry = (struct.pack(">I", 8 + 78) + b"avc1"
                      + b"\x00" * 6 + struct.pack(">H", 1)
                      + b"\x00" * 16
                      + struct.pack(">HH", 64, 48) + b"\x00" * 50)
        stbl = (full(b"stsd", 0, struct.pack(">I", 1) + stsd_entry)
                + full(b"stts", 0, struct.pack(">III", 1, 6, 100))
                + full(b"stsc", 0, struct.pack(">IIII", 1, 1, 3, 1))
                + full(b"stsz", 0, struct.pack(">II", 0, 6)
                       + b"".join(struct.pack(">I", len(f))
                                  for f in frames))
                + full(b"stco", 0, struct.pack(">III", 2, off1, off2))
                + full(b"stss", 0, struct.pack(">III", 2, 1, 4)))
        minf = B(b"minf", B(b"stbl", stbl))
        hdlr = full(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
                    + b"\x00" * 12 + b"v\x00")
        mdhd = full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, 1000, 600,
                                            0x55C4, 0))
        mdia = B(b"mdia", mdhd + hdlr + minf)
        tkhd = full(b"tkhd", 0, struct.pack(">III", 0, 0, 7)
                    + b"\x00" * 64
                    + struct.pack(">II", 64 << 16, 48 << 16))
        mvhd = full(b"mvhd", 0, struct.pack(">IIII", 0, 0, 1000, 600)
                    + b"\x00" * 80)
        moov = B(b"moov", mvhd + B(b"trak", tkhd + mdia))
        return ftyp + mdat + moov, frames, (off1, off2)

    def test_parse_and_sample_tables(self):
        from sparksketch.mp4 import parse_mp4
        blob, frames, (off1, off2) = self._minimal_mp4()
        meta = parse_mp4(blob)
        assert meta["brand"] == "isom"
        assert meta["timescale"] == 1000 and meta["duration_s"] == 0.6
        (trk,) = meta["tracks"]
        assert trk["id"] == 7 and trk["handler"] == "vide"
        assert trk["codec"] == "avc1"
        assert (trk["width"], trk["height"]) == (64, 48)
        assert trk["n_samples"] == 6
        assert trk["sync"].tolist() == [0, 3]
        assert trk["dts"].tolist() == [0, 100, 200, 300, 400, 500]
        # byte-exact recovery of every frame from (offset, size)
        for i in range(6):
            o, s = int(trk["offsets"][i]), int(trk["sizes"][i])
            assert blob[o:o + s] == frames[i], i
        assert int(trk["offsets"][0]) == off1
        assert int(trk["offsets"][3]) == off2

    def test_frame_plan_picks_sync_samples(self):
        from sparksketch.mp4 import mp4_frame_plan
        blob, frames, _ = self._minimal_mp4()
        plan = mp4_frame_plan(blob, every_ms=200)
        # 600ms track, sync at 0ms (sample 0) and 300ms (sample 3)
        assert [(i, ts) for i, ts, _, _ in plan] == [(0, 0), (0, 200),
                                                     (3, 400)]
        for idx, _, off, size in plan:
            assert blob[off:off + size] == frames[idx]

    def test_malformed_mp4_fails_fast(self):
        import pytest
        from sparksketch.mp4 import parse_mp4
        with pytest.raises(ValueError, match="ftyp"):
            parse_mp4(b"\x00\x00\x00\x08junk")
        blob, _, _ = self._minimal_mp4()
        with pytest.raises(ValueError):
            parse_mp4(blob[:40])  # truncated inside mdat/moov

    def test_sample_video_frames_mp4_branch(self, spark):
        """Distributed path: MP4 payloads yield the sync sample's coded
        bytes per sampled timestamp (binary-in/binary-out, same contract
        as the MJPEG/AVI branch)."""
        from sparksketch.multimodal import sample_video_frames
        blob, frames, _ = self._minimal_mp4()
        df = spark.createDataFrame(
            [(1, "video", bytearray(blob), 600)],
            "media_id long, kind string, payload binary, duration_ms long")
        rows = {(r.frame_idx, r.ts_ms): bytes(r.frame)
                for r in sample_video_frames(df, every_ms=200).collect()}
        assert set(rows) == {(0, 0), (0, 200), (3, 400)}
        assert rows[(0, 0)] == frames[0] and rows[(3, 400)] == frames[3]
