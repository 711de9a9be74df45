"""Decompose the bench build job's 8->32 scaling gap (round-3 VERDICT #3/
round-4 item: "profile the 8->32 build gap ... or a measured breakdown in
BENCH.md attributing the gap").

Stages measured at each parallelism level, same cached 128-partition input:

  scan     — cached-columnar scan only (count over the persisted frame):
             Spark's own floor (task scheduling + cache-batch decode).
  jvm_agg  — pure-JVM aggregation over the same projection
             (approx_count_distinct + avg): how Spark-without-Python scales
             on this host.
  arrow    — mapInPandas identity pass over the prepared projection:
             adds the Python-worker round trip + Arrow encode/decode.
  build    — the real one-pass 4-sketch build (adds the NumPy kernels).
  merge    — build + tree_aggregate_multi (adds the canonical merge +
             driver collect).

Each stage is timed REPS times per level, levels interleaved, best rep
kept, with /proc/stat steal%% recorded — the same drift protection
bench.py uses.  Output: per-stage seconds at each level, the 8->32 ratio,
and each stage's share of the gap, as one JSON line + a markdown table.

Usage: python tools/profile_build.py [n_turns] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
LEVELS = [int(x) for x in
          os.environ.get("PROFILE_LEVELS", "8,32").split(",")]
N_PARTS = int(os.environ.get("PROFILE_PARTS", "128"))


def _steal() -> tuple[int, int]:
    # single source of truth for steal accounting: BENCH.md cites this
    # profiler's numbers alongside bench's — they must not diverge
    from bench import _cpu_times
    return _cpu_times()


def _stages(spark):
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bench import _build_specs
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    tr.count()
    specs = _build_specs(N_TURNS)
    names = list(specs)

    exprs = []
    for name, (spec, cols) in specs.items():
        exprs.extend(spec.prepare_exprs(cols, prefix=f"{name}__"))
    prepared = tr.select(*exprs)
    first = prepared.columns[0]

    def identity_pass():
        import pandas as pd

        def fn(batches):
            n = 0
            for pdf in batches:
                n += len(pdf)
            yield pd.DataFrame({"rows": [n]})

        prepared.mapInPandas(fn, schema="rows long") \
            .agg(F.sum("rows")).collect()

    stages = {
        "scan": lambda: tr.count(),
        "jvm_agg": lambda: prepared.agg(
            F.approx_count_distinct(first), F.count("*")).collect(),
        "arrow": identity_pass,
        "build": lambda: build_partials_multi(tr, specs)
            .agg(F.sum("rows")).collect(),
        "merge": lambda: tree_aggregate_multi(
            build_partials_multi(tr, specs), names),
    }
    # warm-up: spin the Python worker pool before any timed region
    warm = synthesize_transcripts(spark, max(N_TURNS // 100, 1000),
                                  partitions=N_PARTS)
    tree_aggregate_multi(build_partials_multi(warm, specs), names)
    out = {}
    for name, fn in stages.items():
        s0, j0 = _steal()
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        s1, j1 = _steal()
        out[name] = (dt, round(100.0 * (s1 - s0) / max(j1 - j0, 1), 1))
    tr.unpersist()
    return out


def main():
    from pyspark.sql import SparkSession
    all_reps: dict[int, list[dict[str, tuple[float, float]]]] = \
        {c: [] for c in LEVELS}
    for rep in range(REPS):
        for cores in LEVELS:
            spark = (SparkSession.builder.master(f"local[{cores}]")
                     .appName(f"profile-{cores}")
                     .config("spark.sql.shuffle.partitions", str(cores))
                     .config("spark.default.parallelism", str(cores))
                     .config("spark.sql.adaptive.enabled", "true")
                     .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                             "131072")
                     .config("spark.driver.memory", "48g")
                     .config("spark.ui.enabled", "false")
                     .config("spark.ui.showConsoleProgress", "false")
                     .getOrCreate())
            spark.sparkContext.setLogLevel("ERROR")
            all_reps[cores].append(_stages(spark))
            spark.stop()
    lo, hi = LEVELS
    # one COHERENT rep per level (min total time): cross-stage deltas from
    # mixed best-of reps are meaningless under this host's CPU drift
    best: dict[int, dict[str, float]] = {}
    steal: dict[int, dict[str, float]] = {}
    for c in LEVELS:
        rep = min(all_reps[c], key=lambda r: sum(dt for dt, _ in r.values()))
        best[c] = {k: round(dt, 3) for k, (dt, _) in rep.items()}
        steal[c] = {k: st for k, (_, st) in rep.items()}
    report = {"n_turns": N_TURNS, "partitions": N_PARTS, "levels": LEVELS,
              "coherent_rep_sec": {f"c{c}": best[c] for c in LEVELS},
              "steal_pct": {f"c{c}": steal[c] for c in LEVELS},
              "all_reps_sec": {f"c{c}": [
                  {k: round(dt, 3) for k, (dt, _) in r.items()}
                  for r in all_reps[c]] for c in LEVELS},
              "speedup_lo_hi": {k: round(best[lo][k] / best[hi][k], 2)
                                for k in best[lo]}}
    # incremental deltas: what each added layer costs at each level
    for c in LEVELS:
        d = {"arrow_minus_scan":
             round(best[c]["arrow"] - best[c]["scan"], 3),
             "build_minus_arrow":
             round(best[c]["build"] - best[c]["arrow"], 3),
             "merge_minus_build":
             round(best[c]["merge"] - best[c]["build"], 3)}
        report[f"deltas_c{c}"] = d
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
