"""Measure the Python-crossing codec cost: mapInPandas vs mapInArrow.

The 16M-turn stage profile (SCALING_CURVE.json `profile_16m`) shows the
Arrow identity crossing dominating the one-pass build at local[32] and
scaling 0.7x with 4x threads.  Part of that cost is pyspark's
Arrow->pandas Series materialization per batch; `mapInArrow` hands the
raw `pyarrow.RecordBatch` to Python instead, and int64 no-null columns
convert to NumPy zero-copy.  This tool times an identity-consume pass
(same shape as the build's crossing: all prepared hash columns in, one
tiny row out) under both codecs at each parallelism level.

Usage: python tools/arrow_vs_pandas.py [n_turns] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
LEVELS = [8, 32]
N_PARTS = 128


def _prepared(spark):
    from pyspark import StorageLevel

    from bench import _build_specs
    from sparksketch.transcripts import synthesize_transcripts

    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    tr.count()
    specs = _build_specs(N_TURNS)
    # same dedup as build_partials_multi: unique expressions only
    exprs, seen = [], set()
    for name, (spec, cols) in specs.items():
        for c in spec.prepare_exprs(cols, prefix=f"{name}__"):
            key = str(c._jc).rpartition(" AS ")[0]
            if key not in seen:
                seen.add(key)
                exprs.append(c)
    return tr, tr.select(*exprs)


def _identity_pandas(prepared):
    import pandas as pd
    from pyspark.sql import functions as F

    def fn(batches):
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"rows": [n]})

    prepared.mapInPandas(fn, schema="rows long") \
        .agg(F.sum("rows")).collect()


def _identity_arrow(prepared):
    import pyarrow as pa
    from pyspark.sql import functions as F

    def fn(batches):
        n = 0
        for rb in batches:
            n += rb.num_rows
        yield pa.RecordBatch.from_pydict({"rows": [n]})

    prepared.mapInArrow(fn, schema="rows long") \
        .agg(F.sum("rows")).collect()


def _identity_arrow_numpy(prepared):
    """Arrow + the to_numpy conversion the real kernels would need."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    def fn(batches):
        n = 0
        for rb in batches:
            for i in range(rb.num_columns):
                arr = rb.column(i).to_numpy(zero_copy_only=False)
                n += 1 if arr is not None else 0
            n += rb.num_rows
        yield pa.RecordBatch.from_pydict({"rows": [n]})

    prepared.mapInArrow(fn, schema="rows long") \
        .agg(F.sum("rows")).collect()


def main() -> None:
    from pyspark.sql import SparkSession

    modes = {"pandas": _identity_pandas, "arrow": _identity_arrow,
             "arrow_numpy": _identity_arrow_numpy}
    reps: dict[tuple[int, str], list[float]] = {
        (lv, m): [] for lv in LEVELS for m in modes}
    for rep in range(REPS):
        for lv in LEVELS:
            spark = (SparkSession.builder.master(f"local[{lv}]")
                     .appName(f"codec-{lv}")
                     .config("spark.sql.shuffle.partitions", str(lv))
                     .config("spark.sql.adaptive.enabled", "true")
                     .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                             "131072")
                     .config("spark.driver.memory", "48g")
                     .config("spark.ui.enabled", "false")
                     .config("spark.ui.showConsoleProgress", "false")
                     .getOrCreate())
            spark.sparkContext.setLogLevel("ERROR")
            tr, prepared = _prepared(spark)
            for m, fn in modes.items():
                fn(prepared)  # warm this codec's worker path
                t0 = time.monotonic()
                fn(prepared)
                dt = time.monotonic() - t0
                reps[(lv, m)].append(dt)
                print(f"rep={rep} local[{lv}] {m}: {dt:.3f}s", flush=True)
            tr.unpersist()
            spark.stop()

    out = {"n_turns": N_TURNS, "reps": REPS, "best_sec": {}}
    for lv in LEVELS:
        for m in modes:
            out["best_sec"][f"c{lv}_{m}"] = round(min(reps[(lv, m)]), 3)
    for lv in LEVELS:
        p = out["best_sec"][f"c{lv}_pandas"]
        a = out["best_sec"][f"c{lv}_arrow"]
        out["best_sec"][f"c{lv}_arrow_vs_pandas"] = round(p / a, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
