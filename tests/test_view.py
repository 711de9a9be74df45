"""Materialized sketch views (sparksketch/view.py): incremental
append, grouping-set queries, compaction, spec guard, and the
exact-regime oracle — view estimates must EQUAL Spark SQL exact
distinct counts when the bottom-k sketches are below capacity.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.agg import BottomKSpec, HLLSpec
from sparksketch.view import (view_append, view_compact, view_materialize,
                              view_query, view_rows)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _exact(df, dims):
    g = df.groupBy(*dims).agg(
        F.countDistinct("user_id").alias("exact"),
        F.count(F.lit(1)).alias("exact_rows"))
    return {tuple(r[d] for d in dims): (r["exact"], r["exact_rows"])
            for r in g.collect()}


class TestSketchView:
    SPEC = BottomKSpec(k=65536)  # far above sf0.001 distinct counts

    def _build(self, events, tmp_path, split_col="event_id"):
        """Materialize from one half of the facts, append the other —
        the daily-ingest shape."""
        path = str(tmp_path / "view")
        h = F.xxhash64(F.col(split_col).cast("string")) % 2 == 0
        view_materialize(events.filter(h), ["event_type"], self.SPEC,
                         ["user_id"], path)
        seg = view_append(events.filter(~h), self.SPEC, ["user_id"], path)
        assert seg == 1
        return path

    def test_append_then_query_exact(self, spark, events, tmp_path):
        path = self._build(events, tmp_path)
        got = {r["event_type"]: (r["estimate"], r["rows"])
               for r in view_query(spark, path).collect()}
        want = _exact(events, ["event_type"])
        assert set(got) == {k[0] for k in want}
        for (k,), (exact, exact_rows) in want.items():
            est, rows = got[k]
            assert est == exact, k        # bottom-k exact regime
            assert rows == exact_rows

    def test_rollup_to_global(self, spark, events, tmp_path):
        path = self._build(events, tmp_path)
        row = view_query(spark, path, group_cols=[]).collect()
        assert len(row) == 1
        assert row[0]["estimate"] == \
            events.select("user_id").distinct().count()
        assert row[0]["rows"] == events.count()

    def test_where_prunes_before_merge(self, spark, events, tmp_path):
        path = self._build(events, tmp_path)
        some_type = events.select("event_type").first()[0]
        got = view_query(spark, path,
                         where=F.col("event_type") == some_type).collect()
        assert len(got) == 1
        exact = (events.filter(F.col("event_type") == some_type)
                 .select("user_id").distinct().count())
        assert got[0]["estimate"] == exact

    def test_segment_restriction_is_partition_pruned(self, spark, events,
                                                     tmp_path):
        path = self._build(events, tmp_path)
        # only segment 0: estimates reflect HALF the facts
        half = view_query(spark, path, group_cols=[], segments=[0])
        h = F.xxhash64(F.col("event_id").cast("string")) % 2 == 0
        exact_half = (events.filter(h).select("user_id")
                      .distinct().count())
        assert half.collect()[0]["estimate"] == exact_half
        # and the seg filter is PARTITION pruning in the physical scan
        plan = view_rows(spark, path, group_cols=[],
                         segments=[0])._jdf.queryExecution() \
            .executedPlan().toString()
        assert "PartitionFilters" in plan and "seg" in plan

    def test_compact_preserves_estimates(self, spark, events, tmp_path):
        path = self._build(events, tmp_path)
        before = {r["event_type"]: r["estimate"]
                  for r in view_query(spark, path).collect()}
        seg = view_compact(spark, path)
        after = {r["event_type"]: r["estimate"]
                 for r in view_query(spark, path).collect()}
        assert after == before
        # one active segment now, and it is the new one
        from sparksketch.view import _manifest_info
        _, _, active, _, _ = _manifest_info(spark, path)
        assert active == [seg]

    def test_spec_mismatch_rejected(self, spark, events, tmp_path):
        path = self._build(events, tmp_path)
        with pytest.raises(ValueError, match="spec mismatch"):
            view_append(events, HLLSpec(p=12), ["user_id"], path)

    def test_unknown_group_col_rejected(self, spark, events, tmp_path):
        path = self._build(events, tmp_path)
        with pytest.raises(ValueError, match="not in view dims"):
            view_query(spark, path, group_cols=["nope"])

    def test_stream_writer_exactly_once(self, spark, events, tmp_path):
        """foreachBatch maintenance: one segment per micro-batch from a
        file stream; a replayed batch id is a no-op; the final view
        answers exactly."""
        from sparksketch.view import _manifest_info, view_stream_writer
        src = str(tmp_path / "src")
        path = str(tmp_path / "sview")
        # two source files -> two micro-batches (maxFilesPerTrigger=1);
        # the file source needs a flat dir of files, so lift the part
        # files out of the write directories
        import glob
        import shutil
        h = F.xxhash64(F.col("event_id").cast("string")) % 2 == 0
        events.filter(h).coalesce(1).write.parquet(src + "/a")
        events.filter(~h).coalesce(1).write.parquet(src + "/b")
        for i, d in enumerate(("a", "b")):
            part = glob.glob(f"{src}/{d}/part-*.parquet")[0]
            shutil.move(part, f"{src}/{i:03d}.parquet")
            shutil.rmtree(f"{src}/{d}")
        schema = events.schema
        writer = view_stream_writer(["event_type"], self.SPEC,
                                    ["user_id"], path)
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = (stream.writeStream.foreachBatch(writer)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        _, _, active, _, rows_m = _manifest_info(spark, path)
        assert len(active) == 2
        notes = sorted(r[4] for r in rows_m)
        assert notes == ["stream_batch=0", "stream_batch=1"]
        # crash-replay of the last committed batch: a no-op
        writer(events.filter(~h), 1)
        _, _, active2, _, _ = _manifest_info(spark, path)
        assert active2 == active
        got = {r["event_type"]: r["estimate"]
               for r in view_query(spark, path).collect()}
        want = _exact(events, ["event_type"])
        assert got == {k[0]: v[0] for k, v in want.items()}

    def test_multi_dim_view_with_null_dim_values(self, spark, events,
                                                 tmp_path):
        """Two dims, one with NULLs injected: per-(type, flag) groups,
        rollup to flag alone, and NULL group keys all survive the
        segment merge exactly."""
        path = str(tmp_path / "mdview")
        ev = events.withColumn(
            "flag", F.when(F.col("event_id") % 3 == 0, F.lit(None))
            .otherwise((F.col("event_id") % 2 == 0).cast("string")))
        h = F.xxhash64(F.col("event_id").cast("string")) % 2 == 0
        view_materialize(ev.filter(h), ["event_type", "flag"], self.SPEC,
                         ["user_id"], path)
        view_append(ev.filter(~h), self.SPEC, ["user_id"], path)
        got = {(r["event_type"], r["flag"]): r["estimate"]
               for r in view_query(spark, path).collect()}
        want = {(r["event_type"], r["flag"]): r["exact"]
                for r in ev.groupBy("event_type", "flag").agg(
                    F.countDistinct("user_id").alias("exact")).collect()}
        assert got == {k: float(v) for k, v in want.items()}
        assert any(k[1] is None for k in got)  # NULL keys present
        # rollup to the OTHER dim crosses the dropped-dim boundary
        got2 = {r["flag"]: r["estimate"]
                for r in view_query(spark, path,
                                    group_cols=["flag"]).collect()}
        want2 = {r["flag"]: r["exact"]
                 for r in ev.groupBy("flag").agg(
                     F.countDistinct("user_id").alias("exact")).collect()}
        assert got2 == {k: float(v) for k, v in want2.items()}

    def test_hll_view_within_bound(self, spark, events, tmp_path):
        """Approximate-regime kind through the same lifecycle: HLL
        estimates after materialize+append stay inside the 3-sigma
        published bound per group."""
        path = str(tmp_path / "hview")
        spec = HLLSpec(p=12)
        h = F.xxhash64(F.col("event_id").cast("string")) % 2 == 0
        view_materialize(events.filter(h), ["event_type"], spec,
                         ["user_id"], path)
        view_append(events.filter(~h), spec, ["user_id"], path)
        want = _exact(events, ["event_type"])
        sigma = 1.04 / np.sqrt(1 << 12)
        for r in view_query(spark, path).collect():
            exact = want[(r["event_type"],)][0]
            assert abs(r["estimate"] - exact) <= 3 * sigma * exact + 2
