"""spark.read.format("sketchview") — the Python Data Source over a
materialized sketch view: schema derivation, bucket-parallel exact
merge, and segment restriction.
"""
import pytest
from pyspark.sql import functions as F

from sparksketch.agg import BottomKSpec
from sparksketch.datasource import SketchViewDataSource
from sparksketch.view import view_append, view_materialize


@pytest.fixture(scope="module")
def view_path(spark, sf_dir, tmp_path_factory):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path_factory.mktemp("dsv") / "view")
    h = F.xxhash64(F.col("event_id").cast("string")) % 2 == 0
    spec = BottomKSpec(k=65536)
    view_materialize(events.filter(h), ["event_type"], spec,
                     ["user_id"], path)
    view_append(events.filter(~h), spec, ["user_id"], path)
    spark.dataSource.register(SketchViewDataSource)
    return path


class TestSketchViewDataSource:
    def test_read_matches_exact_counts(self, spark, sf_dir, view_path):
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = {r["event_type"]: (r["estimate"], r["rows"])
               for r in (spark.read.format("sketchview")
                         .option("path", view_path)
                         .option("buckets", 4).load()).collect()}
        want = {r["event_type"]: (r["exact"], r["n"])
                for r in events.groupBy("event_type").agg(
                    F.countDistinct("user_id").alias("exact"),
                    F.count(F.lit(1)).alias("n")).collect()}
        assert set(got) == set(want)
        for k, (exact, n) in want.items():
            assert got[k][0] == exact  # bottom-k exact regime
            assert got[k][1] == n

    def test_each_group_emitted_exactly_once(self, spark, view_path):
        df = (spark.read.format("sketchview")
              .option("path", view_path).option("buckets", 16).load())
        types = [r["event_type"] for r in df.collect()]
        assert len(types) == len(set(types))

    def test_segment_restriction(self, spark, sf_dir, view_path):
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        h = F.xxhash64(F.col("event_id").cast("string")) % 2 == 0
        got = {r["event_type"]: r["estimate"]
               for r in (spark.read.format("sketchview")
                         .option("path", view_path)
                         .option("segments", "0").load()).collect()}
        want = {r["event_type"]: r["exact"]
                for r in events.filter(h).groupBy("event_type").agg(
                    F.countDistinct("user_id").alias("exact")).collect()}
        assert got == {k: float(v) for k, v in want.items()}

    def test_missing_path_rejected(self, spark, view_path):
        with pytest.raises(Exception, match="path"):
            spark.read.format("sketchview").load().collect()

    def test_null_dim_values_survive(self, spark, sf_dir,
                                     tmp_path_factory):
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        path = str(tmp_path_factory.mktemp("dsn") / "view")
        ev = events.withColumn(
            "flag", F.when(F.col("event_id") % 3 == 0, F.lit(None))
            .otherwise(F.lit("x")))
        view_materialize(ev, ["flag"], BottomKSpec(k=65536),
                         ["user_id"], path)
        got = {r["flag"]: r["estimate"]
               for r in (spark.read.format("sketchview")
                         .option("path", path).load()).collect()}
        want = {r["flag"]: float(r["exact"])
                for r in ev.groupBy("flag").agg(
                    F.countDistinct("user_id").alias("exact")).collect()}
        assert got == want and None in got
