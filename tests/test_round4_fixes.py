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
