"""Same-window A/B: fixed 32-task build vs coalesce-to-cores build.

At 10^12-turn scale per-task costs are proportional at N and 4N executors
(every executor core runs thousands of identical tasks), but at the
sandbox's 8M-turn job the JOB-level fixed costs — driver scheduling of 32
tasks, the 32-blob result ship, the final collect — are a visible slice of
a ~4 s hi-level run and are NOT proportional: the pinned-1 child pays them
on the same single CPU that does the work, the pinned-4 child hides part
of them under executor threads.  ``coalesce(cores)`` before the build
mapInPandas collapses the build into one task per core (what AQE does to
reduce stages, and what a real job's input-split/core ratio looks like at
scale): per-level work is identical, but the measurement stops timing task
granularity that the real criterion amortizes away.

Variants alternate pass-by-pass INSIDE one pinned child per level, so any
window drift hits both variants equally; the paired eff comparison is
window-proof.

Usage: python tools/xp_coalesce.py [--child N]
Env: XP_TURNS (8M), XP_PASSES (5 per variant).
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


def child(cores: int) -> None:
    from pyspark import StorageLevel

    from bench import (BUILD_ARROW_BATCH, N_PARTS, _build_specs, _cpu_times,
                       _session)
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = _build_specs(N_TURNS)
    names = list(specs)
    plan_fixed = build_partials_multi(tr, specs)
    plan_coal = build_partials_multi(tr.coalesce(cores), specs)
    variants = {
        "fixed32": lambda: tree_aggregate_multi(plan_fixed, names,
                                                est_parts=N_PARTS),
        "coalesce": lambda: tree_aggregate_multi(plan_coal, names,
                                                 est_parts=cores),
    }
    for fn in variants.values():  # warm both plans
        fn()
    out = {"cores": cores}
    times = {k: [] for k in variants}
    steals = {k: [] for k in variants}
    for _ in range(PASSES):
        for k, fn in variants.items():  # alternate inside each cycle
            s0, j0 = _cpu_times()
            t0 = time.monotonic()
            fn()
            times[k].append(round(time.monotonic() - t0, 3))
            s1, j1 = _cpu_times()
            steals[k].append(round(
                100.0 * (s1 - s0) / max(j1 - j0, 1), 1))
    for k in variants:
        out[k] = min(times[k])
        out[f"{k}_reps"] = times[k]
        out[f"{k}_steal"] = steals[k]
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
    for cores in (1, 4):
        cmd = ["/usr/bin/taskset", "-c", _pin_spec(cores), sys.executable,
               os.path.abspath(__file__), "--child", str(cores)]
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=2400, cwd=HERE)
        lines = [ln for ln in out.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            raise RuntimeError(f"child {cores} failed: {out.stderr[-2000:]}")
        res[cores] = json.loads(lines[-1])
        print(json.dumps(res[cores]), flush=True)
    print(json.dumps({
        f"eff_{k}": round(res[1][k] / (4 * res[4][k]), 3)
        for k in ("fixed32", "coalesce")}, indent=1))


if __name__ == "__main__":
    main()
