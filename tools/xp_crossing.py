"""Factorial experiment on the Arrow-crossing floor (round-5 scaling work).

Round-4 profiling (SCALING_CURVE.json profile_16m) showed the mapInPandas
identity crossing is ~6 s at BOTH local[8] and local[32] for 16M rows —
flat in thread count — while every pure-JVM stage scales 2.6-2.9x.  A term
that is flat in cores is serialized SOMEWHERE; this script varies, one
factor at a time, the things the serial term could be proportional to:

  cores      {2, 8}      — is it really flat in threads at the (2,8) pair?
  partitions {32, 128}   — per-TASK overhead (fork/socket/setup) story
  columns    {1, 4}      — per-BYTE bandwidth story (round-4's column cut
                           halved the crossing, suggesting bytes matter)

Workload: identity mapInPandas over a cached projection of N int64 hash
columns (exactly the bench build's prepared shape), count-consumed.

Usage: python tools/xp_crossing.py [n_turns] [reps]
"""
from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def _steal():
    from bench import _cpu_times
    return _cpu_times()


def run_level(cores: int) -> dict:
    from pyspark import StorageLevel
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName(f"xp-crossing-{cores}")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.default.parallelism", str(cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    try:
        for parts in (32, 128):
            base = (spark.range(0, N_TURNS, 1, parts)
                    .select(*[F.xxhash64(F.col("id") + i).alias(f"h{i}")
                              for i in range(4)])
                    .persist(StorageLevel.MEMORY_AND_DISK))
            base.count()

            def identity(cols: list[str], src=base):
                import pandas as pd

                def fn(batches):
                    n = 0
                    for pdf in batches:
                        n += len(pdf)
                    yield pd.DataFrame({"rows": [n]})

                src.select(*cols).mapInPandas(fn, schema="rows long") \
                    .agg(F.sum("rows")).collect()

            # warm the worker pool
            identity(["h0"])
            for ncols in (1, 4):
                cols = [f"h{i}" for i in range(ncols)]
                s0, j0 = _steal()
                t0 = time.monotonic()
                identity(cols)
                dt = time.monotonic() - t0
                s1, j1 = _steal()
                out[f"p{parts}_c{ncols}"] = (
                    round(dt, 3),
                    round(100.0 * (s1 - s0) / max(j1 - j0, 1), 1))
            base.unpersist()
    finally:
        spark.stop()
    return out


def main():
    levels = [2, 8]
    reps: dict[int, list[dict]] = {c: [] for c in levels}
    for _ in range(REPS):
        for c in levels:
            reps[c].append(run_level(c))
    best = {c: {k: min(r[k][0] for r in reps[c]) for k in reps[c][0]}
            for c in levels}
    print(json.dumps({
        "n_turns": N_TURNS,
        "best_sec": {f"cores{c}": best[c] for c in levels},
        "all": {f"cores{c}": reps[c] for c in levels},
    }, indent=1))


if __name__ == "__main__":
    main()
