"""Spark aggregation layer: vectorized Arrow/pandas sketch UDAFs.

Execution design (SURVEY.md §4, BASELINE.json north_rule):

- **Hash in the JVM.** Items are hashed with Spark's built-in ``xxhash64``
  (whole-stage-codegen, vectorized) into an (h1, h2) 64-bit pair; Python only
  does closed-form EDH arithmetic on whole Arrow batches.  No per-row Python.
- **Partial aggregation.** ``pandas_udf(GROUPED_AGG)`` has no map-side
  combine, so global sketches are built with ``mapInPandas`` — ONE sketch row
  per input partition, built fully vectorized — then merged with
  ``rdd.treeAggregate`` (depth ~ log4(P)).  Raw rows never shuffle; only
  KB-MB sketch blobs do.
- **Grouped aggregation** is two-phase ``applyInPandas``: (group, salt) ->
  partial sketch, then group -> merged sketch.  Salting is sound because
  every mergeable sketch kind here has a commutative+associative merge.
- **Byte-identical associativity.** OR/sum/max/min-merge kinds (bloom,
  counting, layered, HLL, CMS, bottom-k, minhash) produce byte-identical
  results for ANY partitioning / merge order.  KLL and t-digest are
  deterministic given a fixed partitioning; pass ``canonical=True`` to merge
  partials in sorted-partition order for run-to-run reproducibility.
- **Skew.** Hot groups are split by a salt derived from the item hash
  (``pmod(h1, salt)``), merged in a second, tiny shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BinaryType, BooleanType, LongType

from .shape import Shape, StableShape
from .sketches import (BloomFilter, BottomKSketch, CountMinSketch,
                       CountingBloomFilter, HyperLogLog, KLLSketch,
                       LayeredBloomFilter, MinHashSketch, StableBloomFilter,
                       TDigest, merge_bytes, sketch_from_bytes)
from .sketches.base import Sketch

H2_SEED = 0xB10F  # literal mixed into the second xxhash64

PARTIAL_SCHEMA = "pid long, sketch binary, rows long"


# --------------------------------------------------------------------------
# Specs: how to prepare columns and feed batches into each sketch kind
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class SketchSpec:
    """Describes one sketch aggregation: key columns -> sketch kind."""

    needs_h2: bool = field(default=True, init=False)
    value_col: str | None = field(default=None, init=False)

    def empty(self) -> Sketch:
        raise NotImplementedError

    def update(self, sk: Sketch, pdf: pd.DataFrame) -> None:
        raise NotImplementedError

    def prepare(self, df: DataFrame, cols: Sequence[str | Column],
                keep: Sequence[str] = ()) -> DataFrame:
        """Project down to hash/value columns — the ONLY columns that cross
        the Arrow boundary (column pruning reaches the scan)."""
        out = [F.xxhash64(*cols).alias("h1")]
        if self.needs_h2:
            out.append(F.xxhash64(F.lit(H2_SEED), *cols).alias("h2"))
        if self.value_col is not None:
            out.append(F.col(self.value_col).cast("double").alias("value"))
        return df.select(*[F.col(c) for c in keep], *out)


@dataclass(frozen=True)
class BloomSpec(SketchSpec):
    shape: Shape

    def empty(self) -> Sketch:
        return BloomFilter(self.shape)

    def update(self, sk, pdf) -> None:
        sk.add_hashes(pdf["h1"].to_numpy(), pdf["h2"].to_numpy())


@dataclass(frozen=True)
class CountingBloomSpec(SketchSpec):
    shape: Shape

    def empty(self) -> Sketch:
        return CountingBloomFilter(self.shape)

    def update(self, sk, pdf) -> None:
        sk.add_hashes(pdf["h1"].to_numpy(), pdf["h2"].to_numpy())


@dataclass(frozen=True)
class HLLSpec(SketchSpec):
    p: int = 14

    def __post_init__(self):
        object.__setattr__(self, "needs_h2", False)

    def empty(self) -> Sketch:
        return HyperLogLog(self.p)

    def update(self, sk, pdf) -> None:
        sk.add_hashes(pdf["h1"].to_numpy())


@dataclass(frozen=True)
class CMSSpec(SketchSpec):
    w: int = 1 << 16
    d: int = 4

    def empty(self) -> Sketch:
        return CountMinSketch(self.w, self.d)

    def update(self, sk, pdf) -> None:
        sk.add_hashes(pdf["h1"].to_numpy(), pdf["h2"].to_numpy())


@dataclass(frozen=True)
class KLLSpec(SketchSpec):
    k: int = 200
    col: str = "value"

    def __post_init__(self):
        object.__setattr__(self, "needs_h2", False)
        object.__setattr__(self, "value_col", self.col)

    def empty(self) -> Sketch:
        return KLLSketch(self.k)

    def update(self, sk, pdf) -> None:
        sk.add_values(pdf["value"].to_numpy())


@dataclass(frozen=True)
class TDigestSpec(SketchSpec):
    compression: float = 100.0
    col: str = "value"

    def __post_init__(self):
        object.__setattr__(self, "needs_h2", False)
        object.__setattr__(self, "value_col", self.col)

    def empty(self) -> Sketch:
        return TDigest(self.compression)

    def update(self, sk, pdf) -> None:
        sk.add_values(pdf["value"].to_numpy())


@dataclass(frozen=True)
class BottomKSpec(SketchSpec):
    k: int = 1024
    col: str | None = None  # optional payload value column

    def __post_init__(self):
        object.__setattr__(self, "needs_h2", False)
        object.__setattr__(self, "value_col", self.col)

    def empty(self) -> Sketch:
        return BottomKSketch(self.k)

    def update(self, sk, pdf) -> None:
        vals = pdf["value"].to_numpy() if self.col is not None else None
        sk.add_hashes(pdf["h1"].to_numpy(), vals)


@dataclass(frozen=True)
class MinHashSpec(SketchSpec):
    n_perm: int = 128
    seed: int = 42

    def __post_init__(self):
        object.__setattr__(self, "needs_h2", False)

    def empty(self) -> Sketch:
        return MinHashSketch(self.n_perm, self.seed)

    def update(self, sk, pdf) -> None:
        sk.add_hashes(pdf["h1"].to_numpy())


@dataclass(frozen=True)
class LayeredBloomSpec(SketchSpec):
    """Layer key column must be an int64 bucket (e.g. epoch-hour of ts)."""
    shape: Shape
    layer_col: str = "layer"

    def __post_init__(self):
        object.__setattr__(self, "value_col", None)

    def prepare(self, df, cols, keep=()):
        return df.select(
            *[F.col(c) for c in keep],
            F.col(self.layer_col).cast("long").alias("layer"),
            F.xxhash64(*cols).alias("h1"),
            F.xxhash64(F.lit(H2_SEED), *cols).alias("h2"))

    def empty(self) -> Sketch:
        return LayeredBloomFilter(self.shape)

    def update(self, sk, pdf) -> None:
        sk.add_hashes(pdf["layer"].to_numpy(),
                      pdf["h1"].to_numpy(), pdf["h2"].to_numpy())


# --------------------------------------------------------------------------
# Global (ungrouped) aggregation: mapInPandas partials + treeAggregate
# --------------------------------------------------------------------------

def _partial_builder(spec: SketchSpec):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        sk = spec.empty()
        rows = 0
        for pdf in batches:
            if len(pdf):
                spec.update(sk, pdf)
                rows += len(pdf)
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame({"pid": [pid], "sketch": [sk.to_bytes()],
                            "rows": [rows]})
    return fn


def build_partials(df: DataFrame, spec: SketchSpec,
                   cols: Sequence[str | Column]) -> DataFrame:
    """One sketch row per input partition (the map-side combine the pandas
    UDAF API lacks).  Output: DataFrame[pid, sketch, rows]."""
    return spec.prepare(df, cols).mapInPandas(
        _partial_builder(spec), schema=PARTIAL_SCHEMA)


def tree_aggregate(partials: DataFrame, depth: int | None = None,
                   canonical: bool = False) -> bytes | None:
    """Merge partial-sketch rows to one serialized sketch.

    ``canonical=True`` folds partials in sorted-pid order on the driver —
    needed only for run-to-run byte determinism of KLL/t-digest; the
    commutative kinds are byte-identical either way.  Partials are one row
    per partition (KB-MB each), so even the driver fold is tiny; the
    treeAggregate path exists for very high partition counts at cluster
    scale (north_star names treeAggregate)."""
    if canonical:
        rows = partials.select("pid", "sketch").collect()
        blobs = [bytes(r.sketch) for r in sorted(rows, key=lambda r: r.pid)]
        return reduce(merge_bytes, blobs, None)
    rdd = partials.select("sketch").rdd.map(lambda r: bytes(r[0]))
    n_parts = max(rdd.getNumPartitions(), 1)
    if depth is None:
        depth = max(2, int(np.ceil(np.log(max(n_parts, 2)) / np.log(4))))
    return rdd.treeAggregate(None, merge_bytes, merge_bytes, depth=depth)


def sketch_dataframe(df: DataFrame, spec: SketchSpec,
                     cols: Sequence[str | Column],
                     canonical: bool = False) -> Sketch:
    """Build + merge in one call; returns the deserialized final sketch."""
    blob = tree_aggregate(build_partials(df, spec, cols), canonical=canonical)
    if blob is None:
        return spec.empty()
    return sketch_from_bytes(blob)


# --------------------------------------------------------------------------
# Grouped aggregation: two-phase applyInPandas with optional salting
# --------------------------------------------------------------------------

def grouped_sketch(df: DataFrame, group_cols: Sequence[str],
                   spec: SketchSpec, cols: Sequence[str | Column],
                   salt: int | None = None) -> DataFrame:
    """``groupBy(group_cols).agg(sketch)`` -> DataFrame[*group_cols, sketch,
    rows].

    With ``salt=S``, hot groups are split S ways on ``pmod(h1, S)`` first
    (partial sketches), then re-merged — valid because merges are
    associative+commutative.  Two small shuffles replace one skewed one.
    """
    prepared = spec.prepare(df, cols, keep=group_cols)
    gtypes = dict(df.select(*group_cols).dtypes)
    out_schema = ", ".join([f"`{c}` {gtypes[c]}" for c in group_cols]
                           + ["sketch binary", "rows long"])

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sk = spec.empty()
        spec.update(sk, pdf)
        data = {c: [key[i]] for i, c in enumerate(group_cols)}
        data["sketch"] = [sk.to_bytes()]
        data["rows"] = [len(pdf)]
        return pd.DataFrame(data)

    if salt is None:
        return prepared.groupBy(*group_cols).applyInPandas(build, out_schema)

    salted = prepared.withColumn("_salt", F.pmod(F.col("h1"), F.lit(salt)))

    def build_salted(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sk = spec.empty()
        spec.update(sk, pdf)
        data = {c: [key[i]] for i, c in enumerate(group_cols)}
        data["sketch"] = [sk.to_bytes()]
        data["rows"] = [len(pdf)]
        return pd.DataFrame(data)

    stage1 = salted.groupBy(*group_cols, "_salt").applyInPandas(
        build_salted, out_schema)

    def merge_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blob = reduce(merge_bytes, [bytes(b) for b in pdf["sketch"]], None)
        data = {c: [key[i]] for i, c in enumerate(group_cols)}
        data["sketch"] = [blob]
        data["rows"] = [int(pdf["rows"].sum())]
        return pd.DataFrame(data)

    return stage1.groupBy(*group_cols).applyInPandas(merge_group, out_schema)


# --------------------------------------------------------------------------
# Scalar sketch functions over DataFrames
# --------------------------------------------------------------------------

_SKETCH_CACHE: dict[bytes, Sketch] = {}


def _cached_sketch(blob: bytes) -> Sketch:
    sk = _SKETCH_CACHE.get(blob)
    if sk is None:
        if len(_SKETCH_CACHE) > 8:
            _SKETCH_CACHE.clear()
        sk = sketch_from_bytes(blob)
        _SKETCH_CACHE[blob] = sk
    return sk


def with_might_contain(df: DataFrame, blob: bytes,
                       cols: Sequence[str | Column],
                       out_col: str = "might_contain") -> DataFrame:
    """Adds a boolean membership column probing a broadcast Bloom-family
    sketch — Spark's bloom-semi-join pattern (cf. the engine-internal
    BloomFilterMightContain runtime filter), expressed as a vectorized
    pandas UDF over JVM-computed hashes."""

    @F.pandas_udf(BooleanType())
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        sk = _cached_sketch(blob)
        return pd.Series(sk.contains_hashes(h1.to_numpy(), h2.to_numpy()))

    return df.withColumn(
        out_col, probe(F.xxhash64(*cols), F.xxhash64(F.lit(H2_SEED), *cols)))


def bloom_semijoin(probe_df: DataFrame, probe_cols: Sequence[str],
                   build_df: DataFrame, build_cols: Sequence[str],
                   expected_n: int, fpp: float = 1e-6) -> DataFrame:
    """Pre-filter ``probe_df`` to rows whose key might exist in ``build_df``.

    Builds a Bloom filter over the (small) build side with treeAggregate and
    broadcasts the KB-scale blob inside the UDF closure — no shuffle of the
    probe side, filter applied map-side.  With m >> n the filter is
    effectively exact (zero FP), making this a drop-in distributed semi-join
    data-reduction operator (A6 -> "bloom semi-join" per SURVEY.md Table C).
    """
    shape = Shape.from_np(max(expected_n, 1), fpp)
    blob = tree_aggregate(build_partials(build_df, BloomSpec(shape), build_cols))
    if blob is None:
        return probe_df.limit(0)
    flagged = with_might_contain(probe_df, blob, probe_cols, "_mc")
    return flagged.filter(F.col("_mc")).drop("_mc")


def cms_lookup(df: DataFrame, blob: bytes,
               cols: Sequence[str | Column],
               out_col: str = "cms_count") -> DataFrame:
    """Adds an approximate-count column from a broadcast count-min sketch."""

    @F.pandas_udf(LongType())
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        sk = _cached_sketch(blob)
        return pd.Series(sk.query_hashes(h1.to_numpy(), h2.to_numpy()))

    return df.withColumn(
        out_col, probe(F.xxhash64(*cols), F.xxhash64(F.lit(H2_SEED), *cols)))


# --------------------------------------------------------------------------
# Stable filter: deterministic ordered replay per partition
# --------------------------------------------------------------------------

def stable_build(df: DataFrame, sshape: StableShape,
                 cols: Sequence[str | Column],
                 partition_col: str, order_cols: Sequence[str],
                 num_partitions: int | None = None,
                 seed: int = 42) -> DataFrame:
    """Distributed stable-BF build: hash-partition by ``partition_col``,
    sort within partitions by (partition_col, *order_cols), then replay
    insertions sequentially per partition with a PRNG seeded by
    (seed, partition_id) — byte-identical across runs given the same
    partitioning (SURVEY.md §4 hard-part 1; input_hint stable
    (conv_id, turn_idx) ordering).

    Output: DataFrame[pid, sketch, rows] — one decaying-membership sketch
    per partition.  Cross-partition combination goes through flatten() into
    the associative bitmap domain."""
    nparts = num_partitions or df.rdd.getNumPartitions()
    arranged = (df.repartition(nparts, partition_col)
                  .sortWithinPartitions(partition_col, *order_cols))
    prepared = arranged.select(
        F.xxhash64(*cols).alias("h1"),
        F.xxhash64(F.lit(H2_SEED), *cols).alias("h2"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        sk = StableBloomFilter(sshape, seed=seed ^ (pid * 0x9E3779B1))
        rows = 0
        for pdf in batches:
            if len(pdf):
                sk.insert_hashes(pdf["h1"].to_numpy(), pdf["h2"].to_numpy())
                rows += len(pdf)
        yield pd.DataFrame({"pid": [pid], "sketch": [sk.to_bytes()],
                            "rows": [rows]})

    return prepared.mapInPandas(fn, schema=PARTIAL_SCHEMA)
