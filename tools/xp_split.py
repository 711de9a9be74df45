"""A/B the round-5 split build: sequential vs concurrent sub-jobs.

bench.py's build is now two jobs per pass: the PRE-REDUCED crossing
(JVM hash-agg of the (conv, tool) hash pairs, then HLL+Bloom+CMS over
the ~1M-row distinct stream) and the RAW KLL job (crossing only the
8M-row value column).  This tool measures, per level, INTERLEAVED in
one pinned child so host drift hits all variants equally:

  seq    — reduced job then KLL job (what bench.py does today)
  red    — reduced job alone
  kll    — KLL job alone
  conc   — both jobs submitted from two threads (Spark local scheduler
           overlaps them: the serializer-bound KLL crossing and the
           CPU-scalable hash-agg can share the level's cores)

Usage: python tools/xp_split.py           (parent pins children)
Env: XP_TURNS (8M), XP_PASSES (4), XP_LEVELS (1,4).

MEASURED (2026-08-19, 8M turns, pinned, interleaved):
  level   seq    red    kll    conc
  1       8.286  2.841  6.498  8.159
  4       3.235  0.838  2.175  2.914
  eff     0.640  0.848  0.747  0.700
The reduced trio scales 0.85 even in a mediocre window; the RAW KLL
job (a per-turn value crossing) rides the serializer at 0.75 and
dominates.  This measurement motivated the final round-5 build shape:
the value sketch's input became the conversation-length aggregate
(bench.py _child_build), so NO raw row crosses anywhere.  This tool
still measures the superseded raw-value split for the record.
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
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import StorageLevel

    from bench import BUILD_ARROW_BATCH, N_PARTS, _build_specs, _session
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    parts = N_PARTS
    tr = synthesize_transcripts(spark, N_TURNS, partitions=parts) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = _build_specs(N_TURNS)
    red = {n: s for n, s in specs.items() if s[0].REDUCE is not None}
    raw = {n: s for n, s in specs.items() if s[0].REDUCE is None}
    plan_r = build_partials_multi(tr, red, prereduce=True)
    plan_k = build_partials_multi(tr, raw)
    pool = ThreadPoolExecutor(2)

    def run_red():
        return tree_aggregate_multi(plan_r, list(red), est_parts=cores)

    def run_kll():
        return tree_aggregate_multi(plan_k, list(raw), est_parts=parts)

    variants = {
        "seq": lambda: (run_red(), run_kll()),
        "red": run_red,
        "kll": run_kll,
        "conc": lambda: [f.result() for f in
                         (pool.submit(run_red), pool.submit(run_kll))],
    }
    for fn in variants.values():
        fn()  # warm
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
            capture_output=True, text=True, env={**os.environ,
                                                 "PYTHONPATH": HERE})
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            out[cores] = json.loads(line)
        except Exception:
            print(r.stdout, r.stderr[-2000:], file=sys.stderr)
            raise
        print(cores, out[cores]["best"], flush=True)
    if len(out) == 2:
        lo, hi = sorted(out)
        f = out[lo]["best"], out[hi]["best"]
        for k in f[0]:
            print(f"eff[{k}] ({lo}->{hi}): "
                  f"{f[0][k] / ((hi / lo) * f[1][k]):.3f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
