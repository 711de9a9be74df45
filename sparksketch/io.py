"""Table IO seam: one place where storage format is chosen.

The sandbox has no Iceberg catalog, so the default source is parquet paths
(same columnar, partition-pruned, predicate-pushdown semantics).  In
production the swap is this module only:

    read_table(spark, "catalog.db.transcripts", fmt="iceberg")

and every operator above it — sketch builds, dedup, streaming state —
works unchanged because they only consume DataFrames.  Writes go through
``write_table`` so the checkpoint/state tables get the same one-line swap
(Iceberg/Delta additionally give those writes transactional commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, source: str,
               fmt: str = "parquet") -> DataFrame:
    """Load a table from a path (parquet/…) or a catalog name (iceberg)."""
    if fmt == "parquet":
        return spark.read.parquet(source)
    if fmt == "iceberg":
        # catalog table name, e.g. "my_catalog.db.transcripts"
        return spark.read.format("iceberg").load(source)
    return spark.read.format(fmt).load(source)


def write_table(df: DataFrame, target: str, fmt: str = "parquet",
                mode: str = "overwrite") -> None:
    if fmt == "parquet":
        df.write.mode(mode).parquet(target)
    else:
        df.write.format(fmt).mode(mode).save(target)


def read_stream(spark: SparkSession, source: str, schema,
                fmt: str = "parquet", **options):
    """Streaming source with the same seam (file stream in the sandbox;
    format('iceberg')/format('kafka') in production)."""
    reader = spark.readStream.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "parquet":
        return reader.parquet(source)
    return reader.format(fmt).load(source)
