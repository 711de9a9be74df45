"""Round-4 hardening tests: IVF hot-cell split + incremental append with
drift detection (round-3 VERDICT #5/#8), Spark-I/O sidecar (ADVICE),
prefix-filtered exact jaccard join plumbing, simhash band derivation."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _cell_sub_dirs(path):
    """{(cell, sub): n_files} from the on-disk partition layout."""
    out = {}
    for cd in os.listdir(path):
        if not cd.startswith("cell="):
            continue
        for sd in os.listdir(os.path.join(path, cd)):
            if not sd.startswith("sub="):
                continue
            files = [f for f in os.listdir(os.path.join(path, cd, sd))
                     if f.endswith(".parquet")]
            out[(int(cd.split("=")[1]), int(sd.split("=")[1]))] = len(files)
    return out


class TestIVFHotCellSplit:
    def test_planted_skew_bounds_partitions_and_keeps_recall(
            self, spark, tmp_path):
        """One cell gets 10x the rows of the others; with max_cell_rows
        set below its size the writer must split it into multiple sub
        directories whose row counts stay bounded, while probe recall
        is unchanged (probes read every sub of a probed cell)."""
        from tests.test_pipeline_ops import _clustered_embeddings
        from sparksketch.similarity import (cosine_topk, ivf_query_index,
                                            ivf_write_index)
        emb, centers = _clustered_embeddings(spark, n_clusters=4,
                                             per_cluster=30)
        # plant skew: 300 extra members of cluster 1
        rng = np.random.default_rng(11)
        extra = [(1000 + i,
                  [float(x) for x in centers[1]
                   + rng.standard_normal(16) * 0.15])
                 for i in range(300)]
        emb = emb.unionByName(spark.createDataFrame(
            extra, "vec_id bigint, embedding array<double>"))
        path = str(tmp_path / "ivf_skew")
        ivf_write_index(emb, path, n_centroids=4, refine_iters=2,
                        max_cell_rows=100)
        layout = _cell_sub_dirs(path)
        subs_per_cell = {}
        for (c, s) in layout:
            subs_per_cell.setdefault(c, set()).add(s)
        assert max(len(s) for s in subs_per_cell.values()) >= 3, \
            "hot cell was not split"
        # per-(cell,sub) row counts stay bounded (hash split is
        # approximate: allow 2x the cap)
        rows = (spark.read.parquet(path).groupBy("cell", "sub")
                .count().collect())
        assert max(r["count"] for r in rows) <= 200
        assert sum(r["count"] for r in rows) == 420
        # recall unchanged: exact top-10 still comes back
        q = centers[1] * 1.02
        truth = {r.vec_id for r in cosine_topk(emb, q, k=10).collect()}
        got = {r.vec_id for r in
               ivf_query_index(spark, path, q, k=10, n_probe=2).collect()}
        assert len(truth & got) >= 9

    def test_sidecar_is_a_spark_dataset_under_the_index(
            self, spark, tmp_path):
        """The centroid sidecar must be readable as parquet through Spark
        (no driver-local json), invisible to the data read, and carry
        the per-cell stats appends need."""
        from tests.test_pipeline_ops import _clustered_embeddings
        from sparksketch.similarity import ivf_write_index
        emb, _ = _clustered_embeddings(spark, n_clusters=4, per_cluster=20)
        path = str(tmp_path / "ivf_side")
        cents = ivf_write_index(emb, path, n_centroids=4, refine_iters=1)
        side = spark.read.parquet(path + "/_centroids")
        assert {f.name for f in side.schema.fields} == {
            "cell", "centroid", "n_sub", "cnt", "mean_sim"}
        rows = {r.cell: r for r in side.collect()}
        assert sorted(rows) == [0, 1, 2, 3]
        np.testing.assert_allclose(
            np.asarray([rows[c].centroid for c in range(4)]), cents)
        assert sum(r.cnt for r in rows.values()) == 80
        assert all(0.0 < r.mean_sim <= 1.0 for r in rows.values())
        # the data read must NOT see sidecar rows
        assert spark.read.parquet(path).count() == 80


class TestIVFAppend:
    def test_append_matches_full_rebuild_recall(self, spark, tmp_path):
        from tests.test_pipeline_ops import _clustered_embeddings
        from sparksketch.similarity import (ivf_append_index,
                                            ivf_query_index,
                                            ivf_write_index)
        emb, centers = _clustered_embeddings(spark, n_clusters=4,
                                             per_cluster=40)
        first = emb.filter(F.col("vec_id") % 2 == 0)
        second = emb.filter(F.col("vec_id") % 2 == 1)
        inc = str(tmp_path / "ivf_inc")
        full = str(tmp_path / "ivf_full")
        ivf_write_index(first, inc, n_centroids=4, refine_iters=2)
        report = ivf_append_index(spark, inc, second)
        assert report["appended"] == 80
        assert not report["rebuild_recommended"], report
        ivf_write_index(emb, full, n_centroids=4, refine_iters=2)
        q = centers[2] * 0.98
        got_inc = {r.vec_id for r in
                   ivf_query_index(spark, inc, q, k=10,
                                   n_probe=2).collect()}
        got_full = {r.vec_id for r in
                    ivf_query_index(spark, full, q, k=10,
                                    n_probe=2).collect()}
        assert len(got_inc & got_full) >= 9
        # sidecar stats reflect the append
        side = {r.cell: r for r in
                spark.read.parquet(inc + "/_centroids").collect()}
        assert sum(r.cnt for r in side.values()) == 160

    def test_drifted_append_recommends_rebuild(self, spark, tmp_path):
        """Vectors from a different distribution fit the frozen
        centroids visibly worse -> the drift report flags a rebuild."""
        from tests.test_pipeline_ops import _clustered_embeddings
        from sparksketch.similarity import (ivf_append_index,
                                            ivf_write_index)
        emb, _ = _clustered_embeddings(spark, n_clusters=4, per_cluster=40)
        path = str(tmp_path / "ivf_drift")
        ivf_write_index(emb, path, n_centroids=4, refine_iters=2)
        rng = np.random.default_rng(23)
        noise = [(5000 + i, [float(x) for x in rng.standard_normal(16)])
                 for i in range(100)]
        report = ivf_append_index(
            spark, path,
            spark.createDataFrame(noise,
                                  "vec_id bigint, embedding array<double>"))
        assert report["appended_mean_sim"] < report["baseline_mean_sim"]
        assert report["rebuild_recommended"]

    def test_overflowed_cell_recommends_rebuild(self, spark, tmp_path):
        from tests.test_pipeline_ops import _clustered_embeddings
        from sparksketch.similarity import (ivf_append_index,
                                            ivf_write_index)
        emb, centers = _clustered_embeddings(spark, n_clusters=4,
                                             per_cluster=20)
        path = str(tmp_path / "ivf_over")
        ivf_write_index(emb, path, n_centroids=4, refine_iters=2,
                        max_cell_rows=30)
        rng = np.random.default_rng(31)
        extra = [(2000 + i,
                  [float(x) for x in centers[0]
                   + rng.standard_normal(16) * 0.15])
                 for i in range(200)]
        report = ivf_append_index(
            spark, path,
            spark.createDataFrame(extra,
                                  "vec_id bigint, embedding array<double>"),
            max_cell_rows=30)
        assert report["overflow_cells"]
        assert report["rebuild_recommended"]


class TestBigBlobProbeContract:
    def test_64mb_keyed_blob_decodes_bounded_by_workers(self, spark):
        """Round-3 VERDICT #9, cluster-observed: a REAL >= 64 MB keyed
        layer-blob dict (no lowered-threshold monkeypatch — it crosses
        BLOB_BROADCAST_THRESHOLD on its own and ships as a genuine Spark
        broadcast) probed across 32 partitions decodes each key at most
        once per pooled Python worker: accumulator <= workers x
        keys-touched, far below the per-batch naive count."""
        from sparksketch.agg import (BLOB_BROADCAST_THRESHOLD,
                                     with_keyed_layer_find)
        from sparksketch.shape import Shape
        from sparksketch.sketches import LayeredBloomFilter
        shape = Shape.from_np(1_000_000, 1e-9)  # ~4.3 MB of words/layer
        rng = np.random.default_rng(9)
        blobs = {}
        for k in range(16):
            words = rng.integers(0, 1 << 62, size=shape.m // 64 + 1,
                                 dtype=np.int64).astype(np.uint64)
            blobs[k] = LayeredBloomFilter(shape, {0: words}).to_bytes()
        total = sum(len(b) for b in blobs.values())
        assert total >= 64 << 20, total
        assert total >= BLOB_BROADCAST_THRESHOLD  # real broadcast path
        acc = spark.sparkContext.accumulator(0)
        df = spark.createDataFrame(
            [(i % 16, i) for i in range(3200)], "k int, v long"
        ).repartition(32)
        out = with_keyed_layer_find(df, blobs, "k", ["v"],
                                    decode_acc=acc)
        assert out.filter(F.size("layers") >= 0).count() == 3200
        workers = 8  # generous bound on the local[4] session's pool
        assert 16 <= acc.value <= 16 * workers, acc.value
        assert acc.value < 32 * 16  # naive per-(partition,key) count


class TestPNGCodec:
    def _grad_noise(self, seed=0):
        rng = np.random.default_rng(seed)
        y = np.arange(48)[:, None, None]
        x = np.arange(64)[None, :, None]
        c = np.arange(3)[None, None, :]
        grad = (7 + y * 3 + x * 2 + c * 50) % 256
        noise = rng.integers(0, 256, size=(48, 64, 3))
        return np.where(x < 32, grad, noise).astype(np.uint8)

    def test_roundtrip_exact_and_exercises_filters(self):
        import zlib
        from sparksketch.png import decode_png, encode_png
        px = self._grad_noise()
        blob = encode_png(px)
        assert np.array_equal(decode_png(blob), px)
        raw = zlib.decompress(blob[blob.index(b"IDAT") + 4:len(blob) - 12])
        fids = {raw[r * (64 * 3 + 1)] for r in range(48)}
        assert len(fids) >= 3, f"filter variety too low: {fids}"

    def _hand_built(self, color_type, rows_bytes, w, h, plte=None):
        import struct
        import zlib
        from sparksketch.png import _SIG, _chunk
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        out = _SIG + _chunk(b"IHDR", ihdr)
        if plte is not None:
            out += _chunk(b"PLTE", plte.tobytes())
        return (out + _chunk(b"IDAT", zlib.compress(bytes(rows_bytes)))
                + _chunk(b"IEND", b""))

    def test_gray_palette_rgba_paths(self):
        from sparksketch.png import decode_png
        rng = np.random.default_rng(3)
        h, w = 5, 7
        gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        rows = bytearray()
        for r in range(h):
            rows.append(0)
            rows += gray[r].tobytes()
        assert np.array_equal(decode_png(self._hand_built(0, rows, w, h)),
                              np.repeat(gray[:, :, None], 3, axis=2))
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
        rows = bytearray()
        for r in range(h):
            rows.append(0)
            rows += idx[r].tobytes()
        assert np.array_equal(
            decode_png(self._hand_built(3, rows, w, h, plte=pal)),
            pal[idx])
        rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
        rows = bytearray()
        prev = np.zeros(w * 4, dtype=np.int16)
        for r in range(h):
            raw = rgba[r].reshape(-1).astype(np.int16)
            rows.append(2)  # Up filter
            rows += ((raw - prev) & 0xFF).astype(np.uint8).tobytes()
            prev = raw
        assert np.array_equal(decode_png(self._hand_built(6, rows, w, h)),
                              rgba[:, :, :3])

    def test_fail_fast_on_bad_input(self):
        import struct
        import zlib
        from sparksketch.png import _SIG, _chunk, decode_png, encode_png
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"\x89PNG\r\n\x1a\x00garbage")
        blob = encode_png(self._grad_noise())
        with pytest.raises(ValueError, match="truncated"):
            decode_png(blob[:len(blob) // 2])
        # interlaced with a wrong stream size: 4x4 Adam7 passes need 55
        # bytes, 52 given
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
        bad = (_SIG + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b"\0" * 52))
               + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="Adam7"):
            decode_png(bad)
        ihdr3 = struct.pack(">IIBBBBB", 4, 4, 3, 0, 0, 0, 0)  # depth 3
        bad3 = (_SIG + _chunk(b"IHDR", ihdr3)
                + _chunk(b"IDAT", zlib.compress(b"\0" * 12))
                + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(bad3)
        ihdr2rgb = struct.pack(">IIBBBBB", 4, 4, 2, 2, 0, 0, 0)
        bad2 = (_SIG + _chunk(b"IHDR", ihdr2rgb)
                + _chunk(b"IDAT", zlib.compress(b"\0" * 16))
                + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="sub-byte"):
            decode_png(bad2)

    def test_subbyte_gray_and_palette(self):
        """1/2/4-bit scanlines: big-endian bit order (leftmost pixel in
        the high bits), partial trailing byte, gray range scaling
        (255/(2^d - 1) exact), palette indexing, and byte-level Up
        filtering on packed rows."""
        import struct
        import zlib
        from sparksketch.png import _SIG, _chunk, decode_png
        rng = np.random.default_rng(9)
        h, w = 6, 11  # 11 pixels: partial byte at every sub-byte depth
        for depth in (1, 2, 4):
            gray = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
            rows = bytearray()
            prev = None
            for r in range(h):
                bits = ((gray[r][:, None]
                         >> np.arange(depth - 1, -1, -1)) & 1).ravel()
                packed = np.packbits(bits)  # big-endian, zero-padded
                if prev is None or r % 2 == 0:
                    rows.append(0)
                    rows += packed.tobytes()
                else:
                    rows.append(2)  # Up filter over packed BYTES
                    rows += ((packed.astype(np.int16) - prev) & 0xFF) \
                        .astype(np.uint8).tobytes()
                prev = packed.astype(np.int16)
            ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
            blob = (_SIG + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IDAT", zlib.compress(bytes(rows)))
                    + _chunk(b"IEND", b""))
            scale = 255 // ((1 << depth) - 1)
            assert np.array_equal(
                decode_png(blob),
                np.repeat((gray * scale)[:, :, None], 3, axis=2)), depth
        # 4-bit palette
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
        rows = bytearray()
        for r in range(h):
            bits = ((idx[r][:, None] >> np.arange(3, -1, -1)) & 1).ravel()
            rows.append(0)
            rows += np.packbits(bits).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 4, 3, 0, 0, 0)
        blob = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
                + _chunk(b"IDAT", zlib.compress(bytes(rows)))
                + _chunk(b"IEND", b""))
        assert np.array_equal(decode_png(blob), pal[idx])

    def test_subbyte_interlaced(self):
        """Adam7 + 2-bit gray: per-pass scanline byte widths differ and
        every pass has its own partial trailing byte."""
        import struct
        import zlib
        from sparksketch.png import _ADAM7, _SIG, _chunk, decode_png
        rng = np.random.default_rng(17)
        h, w, depth = 13, 9, 2
        gray = rng.integers(0, 4, size=(h, w), dtype=np.uint8)
        rows = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = gray[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for r in range(sub.shape[0]):
                bits = ((sub[r][:, None]
                         >> np.arange(depth - 1, -1, -1)) & 1).ravel()
                rows.append(0)
                rows += np.packbits(bits).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1)
        blob = (_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(bytes(rows)))
                + _chunk(b"IEND", b""))
        assert np.array_equal(
            decode_png(blob), np.repeat((gray * 85)[:, :, None], 3, axis=2))

    def test_adam7_interlaced_roundtrip_exact(self):
        """Adam7: seven independently filtered sub-images; decode must
        scatter every pass back to the exact grid positions."""
        from sparksketch.png import decode_png, encode_png
        # both a multiple-of-8 shape and a ragged one (exercises empty /
        # partial passes)
        for shape_seed in ((48, 64, 3), (13, 9, 11)):
            h, w, seed = shape_seed
            rng = np.random.default_rng(seed)
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            blob = encode_png(px, interlace=True)
            assert blob[8 + 8 + 12] == 1  # IHDR interlace byte
            assert np.array_equal(decode_png(blob), px)

    def test_16bit_decode_high_byte(self):
        """16-bit RGB: filters run over bytes with bpp=6; the decoder
        reduces to 8-bit via the big-endian high byte."""
        import struct
        import zlib
        from sparksketch.png import _SIG, _chunk, decode_png
        rng = np.random.default_rng(5)
        h, w = 6, 4
        px16 = rng.integers(0, 1 << 16, size=(h, w, 3), dtype=np.uint16)
        be = px16.astype(">u2").view(np.uint8).reshape(h, w * 6)
        rows = bytearray()
        prev = np.zeros(w * 6, dtype=np.int16)
        for r in range(h):
            raw = be[r].astype(np.int16)
            rows.append(2)  # Up filter, over bytes
            rows += ((raw - prev) & 0xFF).astype(np.uint8).tobytes()
            prev = raw
        ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
        blob = (_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(bytes(rows)))
                + _chunk(b"IEND", b""))
        assert np.array_equal(decode_png(blob),
                              (px16 >> 8).astype(np.uint8))

    def test_decode_image_routes_png(self):
        from sparksketch.multimodal import decode_image
        from sparksketch.png import encode_png
        px = self._grad_noise(7)
        assert np.array_equal(decode_image(encode_png(px), "image/png"), px)


class TestJpegMarkerTolerance:
    def test_fill_bytes_and_standalone_markers_in_header(self):
        """0xFF fill bytes before a marker and length-less standalone
        markers (TEM 0x01, stray RSTn) are legal in conforming JFIF
        header streams (T.81 B.1.1.2) — the header walk must skip them,
        not raise 'bad marker alignment' (round-3 ADVICE)."""
        from sparksketch.jpeg import decode_jpeg, encode_jpeg
        y = np.arange(32)[:, None, None]
        x = np.arange(32)[None, :, None]
        c = np.arange(3)[None, None, :]
        px = np.clip(y * 3 + x * 2 + c * 30, 0, 255).astype(np.uint8)
        blob = encode_jpeg(px, quality=90)
        patched = blob[:2] + b"\xff\xff\x01" + b"\xff\xd4" + blob[2:]
        assert np.array_equal(decode_jpeg(patched), decode_jpeg(blob))


class TestSimhashBandDerivation:
    def test_bands_derived_from_threshold_keep_exact_recall(self, spark):
        """max_hamming > 3 now gets max_hamming+1 bands, so the
        pigeonhole recall guarantee holds at ANY threshold (round-3
        ADVICE): banded results equal brute force at max_hamming=6."""
        from sparksketch.dedup import simhash_near_dups
        from sparksketch.text import simhash
        rng = np.random.default_rng(5)
        words = [f"tok{i}" for i in range(300)]
        docs = []
        for i in range(60):
            base = list(rng.choice(words, size=40))
            docs.append((2 * i, " ".join(base)))
            mut = list(base)
            for j in rng.choice(40, size=rng.integers(1, 4), replace=False):
                mut[j] = str(rng.choice(words))
            docs.append((2 * i + 1, " ".join(mut)))
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        sh = {r.doc_id: r.simhash
              for r in simhash(df, "doc_id", "text").collect()}
        mask = (1 << 64) - 1
        want = {(a, b) for a in sh for b in sh if a < b
                and bin((sh[a] ^ sh[b]) & mask).count("1") <= 6}
        got = {(r.id_a, r.id_b) for r in
               simhash_near_dups(df, "doc_id", max_hamming=6).collect()}
        assert got == want and want

    def test_max_hamming_out_of_range_raises(self, spark):
        from sparksketch.dedup import simhash_near_dups
        df = spark.createDataFrame([(1, "a b c")],
                                   "doc_id bigint, text string")
        with pytest.raises(ValueError, match="max_hamming"):
            simhash_near_dups(df, "doc_id", max_hamming=64)

    def test_max_hamming_zero_exact_match_band(self, spark):
        """max_hamming=0 -> one full-64-bit band; the all-ones mask must
        not be emitted as the Java-long-overflowing (1<<64)-1 literal.
        Identical texts collide (hamming 0), near-misses don't."""
        from sparksketch.dedup import simhash_near_dups
        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),
             (2, "the quick brown fox jumps over the lazy dog"),
             (3, "an entirely different document about sketches")],
            "doc_id bigint, text string")
        pairs = {(r.id_a, r.id_b) for r in
                 simhash_near_dups(df, "doc_id", max_hamming=0).collect()}
        assert pairs == {(1, 2)}


class TestJaccardPrefixBoundary:
    def test_threshold_at_fp_noise_boundary(self, spark):
        """0.07 * 100 evaluates to 7.000000000000001; without the eps
        guard ceil() shortened the AllPairs prefix below the completeness
        bound and the pair (J exactly = t) silently vanished."""
        from sparksketch.dedup import jaccard_prefix_pairs
        toks_a = " ".join(f"tok{i} tok{i} x" for i in range(100))
        # build docs whose 3-gram sets give |A|=100 distinct, B subset of
        # 7 -> easier: use shingle_n=1 (token sets) for exact control
        a_text = " ".join(f"w{i}" for i in range(100))
        b_text = " ".join(f"w{i}" for i in range(7))
        del toks_a
        df = spark.createDataFrame([(1, a_text), (2, b_text)],
                                   "doc_id bigint, text string")
        got = jaccard_prefix_pairs(df, "doc_id", shingle_n=1,
                                   threshold=0.07).collect()
        assert [(r.id_a, r.id_b, r.jaccard) for r in got] == \
            [(1, 2, 0.07)]


class TestSketchQuantileHardening:
    """Round-4 self-review fixes on the quantile sketch family."""

    def test_kll_weight_conservation_and_extremes(self):
        """Keep-one-behind compaction: total retained weight must equal n
        exactly (odd compactions used to drift it 4%), and q=0/q=1 must
        return the tracked true extremes, not the innermost survivors."""
        from sparksketch.sketches.kll import KLLSketch
        sk = KLLSketch(8)
        sk.add_values(np.arange(1000, dtype=np.float64))
        v, w = sk._weighted_items()
        assert w.sum() == sk.n == 1000
        assert sk.quantile(0.0) == 0.0
        assert sk.quantile(1.0) == 999.0
        # merge path conserves weight too
        other = KLLSketch(8)
        other.add_values(np.arange(1000, 1500, dtype=np.float64))
        sk.merge(other)
        v, w = sk._weighted_items()
        assert w.sum() == sk.n == 1500
        assert sk.quantile(1.0) == 1499.0
        # quantiles() batch equals per-q calls
        qs = [0.1, 0.5, 0.9]
        assert sk.quantiles(qs) == [sk.quantile(q) for q in qs]

    def test_tdigest_inf_values_do_not_poison(self):
        from sparksketch.sketches.tdigest import TDigest
        td = TDigest(100.0)
        td.add_values(np.concatenate([np.full(20, np.inf),
                                      np.arange(100, dtype=np.float64),
                                      np.full(20, -np.inf)]))
        assert not np.isnan(td.means).any()
        assert td.quantile(0.5) == pytest.approx(49.5, abs=5)
        assert td.quantile(0.0) == -np.inf
        assert td.quantile(1.0) == np.inf

    def test_tdigest_validates_compression_and_cdf_tails(self):
        from sparksketch.sketches.tdigest import TDigest
        with pytest.raises(ValueError, match="compression"):
            TDigest(0.0)
        with pytest.raises(ValueError, match="compression"):
            TDigest(-5.0)
        td = TDigest(100.0)
        rng = np.random.default_rng(3)
        td.add_values(rng.standard_normal(5000))
        # cdf continuous at the extremes: cdf(quantile(q)) ~ q in tails
        for q in (0.01, 0.05, 0.95, 0.99):
            assert td.cdf(td.quantile(q)) == pytest.approx(q, abs=0.01)

    def test_bottomk_nan_payloads_and_oracle_lerp(self):
        from sparksketch.sketches.bottomk import BottomKSketch
        sk = BottomKSketch(16)
        h = np.arange(8, dtype=np.int64)
        vals = np.array([1.0, 2.0, np.nan, 4.0, 5.0, np.nan, 7.0, 8.0])
        sk.add_hashes(h, vals)
        # NaN payload rows stay in the kept set (distinct count intact)...
        assert sk.distinct_estimate() == 8.0
        # ...but quantiles exclude them instead of returning NaN
        assert sk.quantile(1.0) == 8.0
        assert not np.isnan(sk.quantile(0.9))
        assert sk.quantiles([0.0, 1.0]) == [1.0, 8.0]

    def test_bottomk_est_bytes_matches_codec(self):
        from sparksketch.agg import BottomKSpec
        spec = BottomKSpec(k=1024)  # payload-less
        sk = spec.empty()
        sk.add_hashes(np.arange(5000, dtype=np.int64))
        assert len(sk.to_bytes()) <= spec.est_bytes()
