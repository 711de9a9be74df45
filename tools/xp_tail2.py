"""Isolate the build job's non-scaling tail: is it the 96 MB partial-blob
result ship to the driver, and does an executor-side tree round remove it?

Variants timed per pinned level (same cached input, same partials plan):

  full      — tree_aggregate_multi as bench runs it (collect 64 x ~1.5 MB).
  trunc     — same partials plan but every blob column cut to 1 KB JVM-side
              (F.substr) before toPandas: workers still build + Arrow-ship
              the full blobs to the JVM; only the JVM->driver result ship
              shrinks.  full - trunc = the ship's true cost at that level.
  tree8     — one executor-side tree round (fanout 8) before an 8-row
              collect: the scale-correct shape (driver sees O(fanout)).

Usage: python tools/xp_tail2.py            # parent: pinned children at 1,4
       python tools/xp_tail2.py --child N
Env: XP_TURNS (8M), XP_PARTS (64), XP_PASSES (4), XP_LEVELS ("1,4").
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
N_PARTS = int(os.environ.get("XP_PARTS", "64"))
PASSES = int(os.environ.get("XP_PASSES", "4"))
LEVELS = [int(x) for x in os.environ.get("XP_LEVELS", "1,4").split(",")]


def child(cores: int) -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bench import BUILD_ARROW_BATCH, _build_specs, _cpu_times, _session
    from sparksketch.agg import (_collect_partials, build_partials_multi,
                                 tree_aggregate_multi)
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = _build_specs(N_TURNS)
    names = list(specs)
    plan = build_partials_multi(tr, specs)
    truncated = plan.select(
        "pid", "rows", *[F.col(n).substr(1, 1024).alias(n) for n in names])
    tree_aggregate_multi(plan, names, est_parts=N_PARTS)  # warm

    variants = {
        "full": lambda: tree_aggregate_multi(plan, names,
                                             est_parts=N_PARTS),
        "trunc": lambda: _collect_partials(truncated),
        "tree8": lambda: tree_aggregate_multi(plan, names, collect_max=8,
                                              fanout=8, est_parts=N_PARTS),
    }
    out = {"cores": cores}
    for name, fn in variants.items():
        ts, steals = [], []
        for _ in range(PASSES):
            s0, j0 = _cpu_times()
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
            s1, j1 = _cpu_times()
            steals.append(round(100.0 * (s1 - s0) / max(j1 - j0, 1), 1))
        out[name] = round(min(ts), 3)
        out[f"{name}_reps"] = [round(t, 3) for t in ts]
        out[f"{name}_steal"] = steals
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
                             timeout=2400, cwd=HERE)
        lines = [ln for ln in out.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            raise RuntimeError(f"child {cores} failed: {out.stderr[-2000:]}")
        rec = json.loads(lines[-1])
        res[cores] = rec
        print(json.dumps(rec), flush=True)
    if len(LEVELS) == 2:
        lo, hi = LEVELS
        ratio = hi / lo
        summary = {f"eff_{k}": round(res[lo][k] / (ratio * res[hi][k]), 3)
                   for k in ("full", "trunc", "tree8")}
        summary.update({
            f"ship_cost_c{c}": round(res[c]["full"] - res[c]["trunc"], 3)
            for c in LEVELS})
        print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
