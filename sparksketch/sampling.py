"""Deterministic, distributable sampling operators for training-data
pipelines over transcript / document tables.

Training-data curation needs samples that are (a) reproducible run-to-run
(so a pipeline restart or a two-cluster A/B yields the same corpus),
(b) computable map-side wherever possible (a 100 TB scan cannot afford a
shuffle just to subsample), and (c) auditable with plain SQL.  Random
number generators fail (a): `rand(seed)` is partition-layout dependent in
Spark.  Instead every operator here ranks rows by a cryptographic digest
of the row's own key — ``md5(salt:key)`` — which is uniform, engine
independent (Spark and DuckDB produce the identical lowercase hex), and a
pure function of the data, so ANY partitioning of ANY engine selects the
same rows.

Operators
---------
- :func:`hash_threshold_sample` — Bernoulli(rate) by hash-prefix compare.
  Stateless, map-side, NO shuffle: the 100 TB default.
- :func:`weighted_mixture_sample` — per-source rates (the "data mixture"
  step of an LLM pipeline: keep 50% of tool turns, 6% of assistant
  turns, ...).  Also map-side only.
- :func:`per_group_sample` — exactly-k-per-group reservoir (window
  ``row_number`` over the hash rank).  One shuffle on the group key; a
  ``prefilter_rate`` knob bounds the sort input for huge groups.

Design provenance: the reference library (Claudenw/BloomFilters) has no
sampling surface; this extends the engine for the LLM-pipeline tier the
build plan (SURVEY.md §2 Table C / pipeline ops) requires.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

#: hex digits of the md5 prefix the threshold compare uses; 8 digits give
#: rate quantization of 16**-8 ~ 2.3e-10 — far below any sampling noise.
_PREFIX_HEX = 8


def _framed(s: Column) -> Column:
    """Length-framed, null-distinct encoding of one key part.

    ADVICE r04: the previous ``concat_ws(':')`` scheme skipped NULLs (so
    ('a', NULL) and ('a',) hashed identically) and a ':' inside a value
    collided with the delimiter (('a:b',) vs ('a','b')).  Framing each
    part as ``<len>#<value>`` makes the encoding prefix-free (no
    delimiter to inject), and NULL gets the dedicated frame '~' (which no
    framed value can start with — frames start with a digit)."""
    return F.when(s.isNull(), F.lit("~")).otherwise(
        F.concat(F.length(s).cast("string"), F.lit("#"), s))


def sample_hash(cols: Sequence[str | Column], salt: str = "") -> Column:
    """Uniform-[0,1)-equivalent rank: lowercase-hex md5 over the
    length-framed key parts (see ``_framed``; the salt is framed too).

    ``md5``/``concat``/``length`` evaluate identically in Spark SQL and
    DuckDB (``sample_hash_sql`` emits the matching SQL), so an oracle can
    recompute the exact selection.  Pure JVM expression — codegen'd, no
    UDF, no shuffle.
    """
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
             for c in cols]
    salt_f = F.lit(f"{len(salt)}#{salt}")
    return F.md5(F.concat(salt_f, *[_framed(p) for p in parts]))


def sample_hash_sql(col_exprs: Sequence[str], salt: str = "") -> str:
    """The ANSI-SQL rendering of ``sample_hash`` for DuckDB oracles —
    single-sourced here so the Spark expression and the oracle can never
    drift apart.  ``col_exprs`` are SQL expressions (already quoted)."""
    framed = [
        f"CASE WHEN CAST({e} AS VARCHAR) IS NULL THEN '~' ELSE "
        f"concat(CAST(length(CAST({e} AS VARCHAR)) AS VARCHAR), '#', "
        f"CAST({e} AS VARCHAR)) END"
        for e in col_exprs]
    return ("md5(concat('" + f"{len(salt)}#{salt}" + "', "
            + ", ".join(framed) + "))")


def rate_threshold(rate: float) -> str:
    """Hex-prefix threshold so that ``P[md5_prefix < threshold] == rate``
    up to 16**-_PREFIX_HEX quantization (round-half-up on the grid)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    grid = 16 ** _PREFIX_HEX
    q = min(grid, int(rate * grid + 0.5))
    if q >= grid:  # rate ~ 1.0: compare against a prefix no md5 reaches
        return "g" * _PREFIX_HEX  # 'g' > 'f' lexicographically
    return format(q, f"0{_PREFIX_HEX}x")


def hash_threshold_sample(df: DataFrame, key_cols: Sequence[str],
                          rate: float, salt: str = "") -> DataFrame:
    """Deterministic Bernoulli(rate) sample, map-side only.

    Keeps a row iff the first 8 hex digits of ``md5(salt:keys)`` compare
    below the rate's threshold.  No shuffle, no state, reproducible across
    engines/partitionings — at 100 TB this composes with the scan (the
    filter sits directly above the parquet read and pushes the projection
    down).  Rows with equal keys sample together (keyed sampling), which
    is what dedup-aware pipelines want: sample by document id, not by
    physical row.
    """
    h = F.substring(sample_hash(key_cols, salt), 1, _PREFIX_HEX)
    return df.filter(h < F.lit(rate_threshold(rate)))


def weighted_mixture_sample(df: DataFrame, source_col: str,
                            rates: Mapping[str, float],
                            key_cols: Sequence[str],
                            salt: str = "",
                            default_rate: float = 0.0) -> DataFrame:
    """Per-source-rate mixture sampling (LLM data-mixture step).

    Each row's keep-threshold comes from ``rates[source]`` (sources absent
    from the map use ``default_rate``).  Exactly as map-side as
    :func:`hash_threshold_sample`: one digest + one chained-when compare,
    zero shuffles at any scale.
    """
    h = F.substring(sample_hash(key_cols, salt), 1, _PREFIX_HEX)
    thr: Column = F.lit(rate_threshold(default_rate))
    for src, rate in sorted(rates.items()):
        thr = F.when(F.col(source_col) == src,
                     F.lit(rate_threshold(rate))).otherwise(thr)
    return df.filter(h < thr)


def per_group_sample(df: DataFrame, group_cols: Sequence[str],
                     key_cols: Sequence[str], k: int,
                     salt: str = "",
                     prefilter_rate: float | None = None) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, chosen by smallest
    ``md5(salt:group:key)`` — a deterministic distributed reservoir.

    One shuffle on ``group_cols`` (the window), then ``row_number <= k``.
    At 100 TB the window sort of a huge group is the cost center; pass
    ``prefilter_rate`` to run a map-side :func:`hash_threshold_sample`
    over the SAME digest first — because the prefilter keeps exactly the
    rows whose digest falls below its threshold, the global top-k by
    digest is preserved whenever the group's survivor count stays >= k
    (expected survivors = rate * |group|; choose rate so that holds with
    margin, e.g. 100*k / min_group_size).  This turns "sort 10^9 rows per
    hot group" into "sort ~100k rows per hot group" without changing the
    selected sample.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rank_cols = list(group_cols) + list(key_cols)
    h = sample_hash(rank_cols, salt)
    out = df
    if prefilter_rate is not None:
        out = out.filter(F.substring(h, 1, _PREFIX_HEX)
                         < F.lit(rate_threshold(prefilter_rate)))
    w = Window.partitionBy(*group_cols).orderBy(h.asc())
    return (out.withColumn("_rs_rn", F.row_number().over(w))
            .filter(F.col("_rs_rn") <= k)
            .drop("_rs_rn"))
