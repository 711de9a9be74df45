"""Decompose the raw KLL build job at the (1,4) pair.

Variants, interleaved in one pinned child per level:
  scan   — JVM-only: cached scan + projection reduced by sum(value)
  ident  — identity mapInPandas over the 1-column value projection
           (scan + row->Arrow serializer + worker drain, no sketch)
  kll    — the real KLL partial build + merge
  kllbig — same, with 131072-row Arrow batches (bench default is 16384,
           tuned for the 4-sketch multi build's temporaries; a 1-column
           KLL stream may want bigger batches)

Usage: python tools/xp_klljob.py ; env XP_TURNS/XP_PASSES/XP_LEVELS.

MEASURED (2026-08-19, 8M turns, pinned, interleaved):
  level   scan   ident  kll    kllbig
  1       1.468  6.032  6.068  6.120
  4       0.501  2.134  2.250  2.195
The raw KLL job IS the crossing: identity == full KLL to within 1%
(the Python KLL kernel is ~free), batch size is immaterial, and the
crossing-only term (ident - scan) scales 0.70.  Conclusion: a value
sketch fed per-turn values cannot scale past the serializer on this
box; feed it an aggregate (conversation length) instead — which is
also the meaningful transcript analytics quantity.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_TURNS = int(os.environ.get("XP_TURNS", "8000000"))
PASSES = int(os.environ.get("XP_PASSES", "4"))
LEVELS = [int(x) for x in os.environ.get("XP_LEVELS", "1,4").split(",")]


def child(cores: int) -> None:
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bench import BUILD_ARROW_BATCH, N_PARTS, _build_specs, _session
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = _build_specs(N_TURNS)
    raw = {n: s for n, s in specs.items() if s[0].REDUCE is None}
    plan_k = build_partials_multi(tr, raw)
    proj = tr.select(F.col("turn_idx").cast("double").alias("value"))

    def identity(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    ident = proj.mapInPandas(identity, schema="n long")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"

    def run_kll():
        return tree_aggregate_multi(plan_k, list(raw), est_parts=N_PARTS)

    def run_kllbig():
        spark.conf.set(key, str(131072))
        try:
            return tree_aggregate_multi(plan_k, list(raw),
                                        est_parts=N_PARTS)
        finally:
            spark.conf.set(key, str(BUILD_ARROW_BATCH))

    variants = {
        "scan": lambda: proj.agg(F.sum("value")).collect(),
        "ident": lambda: ident.agg(F.sum("n")).collect(),
        "kll": run_kll,
        "kllbig": run_kllbig,
    }
    for fn in variants.values():
        fn()
    times = {k: [] for k in variants}
    for _ in range(PASSES):
        for k, fn in variants.items():
            t0 = time.monotonic()
            fn()
            times[k].append(round(time.monotonic() - t0, 3))
    print(json.dumps({"cores": cores,
                      "best": {k: min(v) for k, v in times.items()},
                      "all": times}))


def main() -> None:
    out = {}
    for cores in LEVELS:
        pin = f"0-{cores - 1}" if cores > 1 else "0"
        r = subprocess.run(
            ["taskset", "-c", pin, sys.executable, os.path.abspath(__file__),
             "--child", str(cores)],
            capture_output=True, text=True,
            env={**os.environ, "PYTHONPATH": HERE})
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            out[cores] = json.loads(line)
        except Exception:
            print(r.stdout, r.stderr[-2000:], file=sys.stderr)
            raise
        print(cores, out[cores]["best"], flush=True)
    if len(out) == 2:
        lo, hi = sorted(out)
        for k in out[lo]["best"]:
            a, b = out[lo]["best"][k], out[hi]["best"][k]
            print(f"eff[{k}] ({lo}->{hi}): {a / ((hi / lo) * b):.3f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
