"""A/B the partial-blob ship strategies for the bench build at one level.

Variants, timed with INTERLEAVED passes inside one pinned child so
minute-scale host volatility (the round-5 measurement plague) hits all
variants equally:

  A  direct   — tree_aggregate_multi as-is: 32 partials x ~1 MB ship to
                the driver through one Arrow collect (31 MB total).
  B  tree1    — one executor-side tree_merge_round_multi(fanout=32)
                first: ship ONE ~1 MB row; costs one extra stage+shuffle.
  C  parts16  — same job on a 16-partition input: half the partials,
                half the task turnarounds, 4 waves at local[4].

Usage: python tools/xp_ship.py [--child N]     (parent pins children)
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
PASSES = int(os.environ.get("XP_PASSES", "5"))
LEVELS = [int(x) for x in os.environ.get("XP_LEVELS", "1,4").split(",")]


def child(cores: int) -> None:
    from pyspark import StorageLevel

    from bench import BUILD_ARROW_BATCH, _build_specs, _session
    from sparksketch.agg import (build_partials_multi, tree_aggregate_multi,
                                 tree_merge_round_multi)
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    specs = _build_specs(N_TURNS)
    names = list(specs)

    tr32 = synthesize_transcripts(spark, N_TURNS, partitions=32) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr32.count()
    tr16 = synthesize_transcripts(spark, N_TURNS, partitions=16) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr16.count()
    plan32 = build_partials_multi(tr32, specs)
    plan16 = build_partials_multi(tr16, specs)

    def run_a():
        tree_aggregate_multi(plan32, names, est_parts=32)

    def run_b():
        folded = tree_merge_round_multi(plan32, names, 32)
        tree_aggregate_multi(folded, names, est_parts=1)

    def run_c():
        tree_aggregate_multi(plan16, names, est_parts=16)

    variants = {"A_direct": run_a, "B_tree1": run_b, "C_parts16": run_c}
    for fn in variants.values():   # one warm pass each
        fn()
    times = {k: [] for k in variants}
    for _ in range(PASSES):
        for k, fn in variants.items():
            t0 = time.monotonic()
            fn()
            times[k].append(round(time.monotonic() - t0, 3))
    out = {"cores": cores}
    for k, ts in times.items():
        out[k] = min(ts)
        out[k + "_reps"] = ts
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    from bench import _pin_spec
    from sparksketch import workerenv
    env = workerenv.configure(dict(os.environ))
    res = {}
    for cores in LEVELS:
        cmd = ["/usr/bin/taskset", "-c", _pin_spec(cores), sys.executable,
               os.path.abspath(__file__), "--child", str(cores)]
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=3600, cwd=HERE)
        lines = [ln for ln in out.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            raise RuntimeError(f"child {cores} failed: {out.stderr[-2000:]}")
        res[cores] = json.loads(lines[-1])
        print(json.dumps(res[cores]), flush=True)
    if len(res) == 2:
        lo, hi = sorted(res)
        ratio = hi // lo
        for k in ("A_direct", "B_tree1", "C_parts16"):
            print(json.dumps({
                "variant": k,
                "eff": round(res[lo][k] / (ratio * res[hi][k]), 3)}))


if __name__ == "__main__":
    main()
