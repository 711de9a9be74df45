"""Materialized sketch views: log-structured, incrementally maintained
sketch rollups — the hypertable-rollup pattern a 100 TB transcript
pipeline needs.  A scheduled job appends one SEGMENT of per-``dims``
sketch rows per batch of new data (the ONLY fact-table scan, built with
the no-raw-shuffle segmented path); interactive queries read KB-scale
sketch rows, merge them with the sketch algebra
(:func:`~sparksketch.agg.regroup_sketch_rows`) and answer at any
grouping set coarser than ``dims`` — never rescanning the facts.
Compaction folds the segment log back to one segment with the same
algebra.

Storage layout (all Spark I/O, so hdfs/s3a work exactly like the IVF
index sidecar — similarity.py ivf_write_index):

    <path>/segments/seg=<id>/*.parquet    [*dims, sketch, rows]
    <path>/manifest/*.parquet             (seg, spec, dims, active, note)

``seg`` is a parquet PARTITION column: restricting a query to specific
segments (e.g. the last day's) is partition pruning in the scan, not a
filter over all rows.  The manifest records repr(spec) so an append with
a mismatched sketch spec fails loudly instead of silently merging
incompatible blobs (the same contract the wire-format VERSION enforces
at the byte level).

Concurrency note: segment files are immutable once written and every
manifest mutation rewrites the whole (O(segments), KB-scale) manifest,
so the stored rows ARE the current state; production deployments that
need transactional manifest commits under concurrent writers swap the
io seam to Iceberg/Delta (io.py) and inherit their atomic commit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .agg import (SketchSpec, grouped_sketch_segmented,
                  regroup_sketch_rows, with_sketch_estimate)

_MANIFEST_SCHEMA = ("seg int, spec string, dims string, active boolean, "
                    "note string")


def _segments_path(path: str) -> str:
    return path.rstrip("/") + "/segments"


def _manifest_path(path: str) -> str:
    return path.rstrip("/") + "/manifest"


def _read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(_MANIFEST_SCHEMA).parquet(_manifest_path(path))


def _write_manifest_rows(spark: SparkSession, path: str, rows,
                         mode: str) -> None:
    (spark.createDataFrame(rows, _MANIFEST_SCHEMA)
     .coalesce(1).write.mode(mode).parquet(_manifest_path(path)))


def _manifest_info(spark: SparkSession, path: str):
    """(dims list, spec repr, active segment ids, max seg id, all rows).

    The manifest is rewritten whole on every mutation (it is O(segments)
    tiny), so the stored rows ARE the current state — no last-writer
    reconciliation needed."""
    rows = [tuple(r) for r in _read_manifest(spark, path).collect()]
    if not rows:
        raise ValueError(f"no sketch view manifest under {path}")
    rows.sort(key=lambda r: r[0])
    dims = rows[0][2].split(",") if rows[0][2] else []
    active = sorted(r[0] for r in rows if r[3])
    return dims, rows[0][1], active, max(r[0] for r in rows), rows


def view_materialize(df: DataFrame, dims: Sequence[str], spec: SketchSpec,
                     cols: Sequence[str | Column], path: str,
                     note: str = "initial") -> None:
    """Create the view: build per-``dims`` sketch rows from ``df`` (one
    fact scan, raw rows never shuffle) and write them as segment 0."""
    dims = list(dims)
    spark = df.sparkSession
    rows = grouped_sketch_segmented(df, dims, spec, cols)
    (rows.write.mode("overwrite")
     .parquet(_segments_path(path) + "/seg=0"))
    _write_manifest_rows(
        spark, path, [(0, repr(spec), ",".join(dims), True, note)],
        "overwrite")


def view_append(df: DataFrame, spec: SketchSpec,
                cols: Sequence[str | Column], path: str,
                note: str = "append") -> int:
    """Append one segment built from new facts (e.g. today's partition).
    The spec must match the view's recorded spec exactly — mergeable
    blobs of different shapes fail loudly here, not silently at query
    time.  Returns the new segment id."""
    spark = df.sparkSession
    dims, spec_repr, _, max_seg, rows_m = _manifest_info(spark, path)
    if repr(spec) != spec_repr:
        raise ValueError(
            f"sketch spec mismatch: view built with {spec_repr}, "
            f"append called with {repr(spec)}")
    seg = max_seg + 1
    rows = grouped_sketch_segmented(df, dims, spec, cols)
    (rows.write.mode("overwrite")
     .parquet(_segments_path(path) + f"/seg={seg}"))
    _write_manifest_rows(
        spark, path,
        rows_m + [(seg, spec_repr, ",".join(dims), True, note)],
        "overwrite")
    return seg


def view_rows(spark: SparkSession, path: str,
              group_cols: Sequence[str] | None = None,
              where: Column | None = None,
              segments: Sequence[int] | None = None) -> DataFrame:
    """Merged sketch rows at the requested grouping set.

    ``group_cols`` defaults to the view's dims; any subset (down to
    ``[]`` = the global sketch) is valid because every kind is
    mergeable.  ``where`` filters on dim columns BEFORE the merge (the
    predicate reaches the parquet scan of KB-scale rows); ``segments``
    restricts to specific segment ids via parquet partition pruning
    (default: the active set)."""
    dims, _, active, _, _ = _manifest_info(spark, path)
    src = spark.read.parquet(_segments_path(path))
    segs = list(segments) if segments is not None else active
    src = src.filter(F.col("seg").isin([int(s) for s in segs]))
    if where is not None:
        src = src.filter(where)
    gcols = dims if group_cols is None else list(group_cols)
    unknown = [c for c in gcols if c not in dims]
    if unknown:
        raise ValueError(f"group cols {unknown} not in view dims {dims}")
    # deterministic merge order: remaining dims, then segment id
    return regroup_sketch_rows(src.select(*dims, "seg", "sketch", "rows"),
                               gcols, order_cols=[*dims, "seg"])


def view_query(spark: SparkSession, path: str,
               group_cols: Sequence[str] | None = None,
               where: Column | None = None,
               segments: Sequence[int] | None = None,
               estimate_col: str = "estimate") -> DataFrame:
    """``view_rows`` + executor-side estimates: the driver only ever sees
    (group, estimate, rows) — sketch blobs stay on the executors."""
    merged = view_rows(spark, path, group_cols, where, segments)
    return (with_sketch_estimate(merged, estimate_col)
            .drop("sketch"))


def view_stream_writer(dims: Sequence[str], spec: SketchSpec,
                       cols: Sequence[str | Column], path: str):
    """``foreachBatch`` sink: continuous view maintenance from a stream,
    one segment per micro-batch, EXACTLY-ONCE across restarts.

        q = (stream.writeStream
             .foreachBatch(view_stream_writer(["role"], spec,
                                              ["conv_id"], path))
             .option("checkpointLocation", ckpt)
             .start())

    Structured Streaming re-delivers the last uncommitted batch after a
    crash.  Segment files are immutable and the manifest note records
    the batch id, so a replayed batch either finds its note (the prior
    attempt committed — no-op) or redoes the whole append; partially
    written segment files without a manifest row are unreachable by
    queries, so the redo overwrites them harmlessly.  The first batch
    creates the view."""
    dims = list(dims)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException
        spark = batch_df.sparkSession
        note = f"stream_batch={batch_id}"
        try:
            _, _, _, _, rows_m = _manifest_info(spark, path)
        except AnalysisException:  # no manifest yet: first batch creates
            view_materialize(batch_df, dims, spec, cols, path, note=note)
            return
        if any(nt == note or nt.startswith(note + ";")
               for *_a, nt in rows_m):
            return  # replayed batch: the prior attempt committed
        view_append(batch_df, spec, cols, path, note=note)

    return fn


def view_compact(spark: SparkSession, path: str,
                 note: str = "compact") -> int:
    """Fold the active segments into one (pure sketch algebra, no fact
    scan).  Old segments stay on storage for lineage but are marked
    inactive; returns the new segment id."""
    dims, spec_repr, active, max_seg, rows_m = _manifest_info(spark, path)
    merged = view_rows(spark, path)  # active set at full dims
    seg = max_seg + 1
    (merged.write.mode("overwrite")
     .parquet(_segments_path(path) + f"/seg={seg}"))
    # notes are PRESERVED (the streaming writer's exactly-once check
    # matches on them); the compaction marker is appended after ';'
    kept = [(s, sp, d, act and s not in active,
             f"{nt}; compacted into {seg}" if act and s in active else nt)
            for s, sp, d, act, nt in rows_m]
    _write_manifest_rows(
        spark, path,
        kept + [(seg, spec_repr, ",".join(dims), True, note)],
        "overwrite")
    return seg
