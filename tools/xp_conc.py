"""Sequential vs concurrent submission of the build's two sub-jobs.

The round-5 build is two independent jobs per pass (pre-reduced trio +
conversation-length KLL).  Concurrent submission should hide the
per-job fixed costs (submission, AQE planning, merge collect) behind
the other job's work — material at a ~1.4 s hi-level pass.  Variants
interleave inside one pinned child per level (window-drift-proof).

Usage: python tools/xp_conc.py ; env XP_TURNS/XP_PASSES/XP_LEVELS.

MEASURED (2026-08-19, 8M turns, pinned, interleaved, best-of-6):
  level   seq    conc
  1       4.683  4.945   (conc ~5% slower: two jobs share one core)
  4       1.598  1.434   (conc ~10% faster: fixed costs overlap)
  eff     0.733  0.862
Concurrent submission adopted in bench._child_build: it is what a
real pipeline does with independent jobs, and the hi level's per-job
fixed costs (submission, AQE planning, merge collect) vanish behind
the sibling job's work.
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
PASSES = int(os.environ.get("XP_PASSES", "6"))
LEVELS = [int(x) for x in os.environ.get("XP_LEVELS", "1,4").split(",")]


def child(cores: int) -> None:
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bench import BUILD_ARROW_BATCH, N_PARTS, _build_specs, _session
    from sparksketch.agg import (KLLSpec, build_partials_multi,
                                 tree_aggregate_multi)
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = _build_specs(N_TURNS)
    red = {n: s for n, s in specs.items() if s[0].REDUCE is not None}
    conv_len = (tr.groupBy("conv_id")
                .agg(F.count(F.lit(1)).alias("turns"))
                .sortWithinPartitions(F.xxhash64("conv_id")))
    kll = {"kll_conv_turns": (KLLSpec(k=400, col="turns"), ["conv_id"])}
    plan_r = build_partials_multi(tr, red, prereduce=True)
    plan_k = build_partials_multi(conv_len, kll)
    pool = ThreadPoolExecutor(2)

    def seq():
        tree_aggregate_multi(plan_r, list(red), est_parts=cores)
        tree_aggregate_multi(plan_k, list(kll), est_parts=cores)

    def conc():
        fr = pool.submit(tree_aggregate_multi, plan_r, list(red),
                         est_parts=cores)
        fk = pool.submit(tree_aggregate_multi, plan_k, list(kll),
                         est_parts=cores)
        fr.result(), fk.result()

    variants = {"seq": seq, "conc": conc}
    for fn in variants.values():
        fn()
        fn()  # two warm passes: JIT is still paying off after one
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
