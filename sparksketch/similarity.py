"""Approximate nearest-neighbor search over an embedding column
(``array<float>``): brute-force cosine top-k baseline + LSH-bucketed and
IVF-style scale paths.

Dot products are JVM expressions (``zip_with`` + ``aggregate``) so the scan
stays in whole-stage codegen; no Arrow crossing for the baseline.  The scale
paths cut the candidate set before scoring: at 100 TB the full scan is the
bottleneck, so bucket pruning (LSH) / centroid pruning (IVF) bound the
scored fraction."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _dot_with_literal(vec, q: np.ndarray):
    arr = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(F.zip_with(vec, arr, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(emb_df: DataFrame, query: np.ndarray, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_id=None) -> DataFrame:
    """Brute-force cosine top-k: one codegen'd scan, orderBy+limit (Spark
    executes as a distributed TakeOrdered — no full sort/shuffle)."""
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    v = _as_double(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    sim = F.round(_dot_with_literal(v, q) / (norm * F.lit(qn)), 5)
    out = emb_df.select(F.col(id_col), sim.alias("sim"))
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("sim"), id_col).limit(k)


def signlsh_topk(emb_df: DataFrame, query: np.ndarray, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = 12, max_flip: int = 2,
                 seed: int = 42) -> DataFrame:
    """LSH-bucketed ANN: score only vectors whose sign-LSH code is within
    ``max_flip`` bits of the query's code.

    Candidate pruning is a JVM bit_count filter over a precomputable int
    column — at scale the code column is materialized/bucketed once and the
    probe touches a small fraction of rows."""
    rng = np.random.default_rng(seed)
    q = np.asarray(query, dtype=np.float64)
    dim = q.size
    planes = rng.standard_normal((n_planes, dim))
    v = _as_double(vec_col)
    code = None
    for i in range(n_planes):
        dot = _dot_with_literal(v, planes[i])
        bit = F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    qcode = int(sum((1 << i) for i in range(n_planes)
                    if float(planes[i] @ q) >= 0))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    sim = F.round(_dot_with_literal(v, q)
                  / (norm * F.lit(float(np.linalg.norm(q)))), 5)
    return (emb_df
            .withColumn("_code", code)
            .filter(F.bit_count(F.col("_code").bitwiseXOR(F.lit(qcode)))
                    <= max_flip)
            .select(F.col(id_col), sim.alias("sim"))
            .orderBy(F.desc("sim"), id_col).limit(k))


def ivf_assign(emb_df: DataFrame, n_centroids: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed: int = 42, sample_n: int = 256) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: centroids from a deterministic sample (one
    k-means-- style averaging pass), then assign each vector to its nearest
    centroid — assignment is a JVM expression argmax.  Returns (assigned_df
    with ``_cell`` column, centroids)."""
    sample = np.array(
        [r[0] for r in emb_df.select(_as_double(vec_col)).limit(sample_n).collect()])
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)),
                     replace=False)
    cents = sample[idx]
    v = _as_double(vec_col)
    scores = [
        F.struct(_dot_with_literal(v, c / max(np.linalg.norm(c), 1e-12))
                 .alias("score"), F.lit(i).alias("cell"))
        for i, c in enumerate(cents)]
    best = F.array_max(F.array(*scores))
    return emb_df.withColumn("_cell", best["cell"]), cents


def ivf_topk(emb_df: DataFrame, query: np.ndarray, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, n_probe: int = 4,
             seed: int = 42) -> DataFrame:
    """IVF ANN: search only the ``n_probe`` cells nearest the query."""
    assigned, cents = ivf_assign(emb_df, n_centroids, id_col, vec_col, seed)
    q = np.asarray(query, dtype=np.float64)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(cn @ q))[:n_probe].tolist()
    v = _as_double(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    sim = F.round(_dot_with_literal(v, q)
                  / (norm * F.lit(float(np.linalg.norm(q)))), 5)
    return (assigned.filter(F.col("_cell").isin(probe))
            .select(F.col(id_col), sim.alias("sim"))
            .orderBy(F.desc("sim"), id_col).limit(k))
