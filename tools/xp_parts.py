"""A/B the scaling pair's input partition count: 4 vs 8 vs 16.

bench.py runs the (1 -> 4) pair on a FIXED 16-partition input (identical
work at both levels).  At the hi level that is 4 waves of 4 tasks; each
wave boundary pays scheduling + straggler tail, and each task pays the
~1.5 MB partial-blob ship.  Fewer, bigger tasks cut both — but one wave
of 4 has no overlap to hide a slow task.  This measures which wins, with
INTERLEAVED passes inside one pinned child per level so minute-scale
host volatility (the round-5 measurement plague) hits all variants
equally; min-of-passes per variant (contention only adds time).

Usage: python tools/xp_parts.py            (parent pins children)
Env: XP_TURNS (default 8M), XP_PASSES (default 5), XP_LEVELS (1,4).

MEASURED (2026-08-19, 8M turns, 5 interleaved passes/level):
  parts   t_lo     t_hi     eff(1->4)
  4       9.381    3.312    0.708
  8       10.320   3.350    0.770
  16      11.106   3.468    0.801
Fewer/bigger tasks cut ABSOLUTE time at both levels (the per-task
worker-pipeline drain is ~0.14 s and serializes fully at local[1]),
but they cut the lo level 3x harder than the hi level (where 4
in-flight tasks overlap each other's drains), so the measured RATIO
worsens.  16 partitions stays: it is the grain a real job would use
(~500K-turn tasks), and the ratio distortion of thin tasks (drains
hidden at hi but exposed at lo) and of fat tasks (stragglers exposed
at hi) trade off closest to even there.
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
PARTS = [int(x) for x in os.environ.get("XP_PARTS", "4,8,16").split(",")]


def child(cores: int) -> None:
    from pyspark import StorageLevel

    from bench import BUILD_ARROW_BATCH, _build_specs, _session
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    specs = _build_specs(N_TURNS)
    names = list(specs)

    plans = {}
    for p in PARTS:
        tr = synthesize_transcripts(spark, N_TURNS, partitions=p) \
            .persist(StorageLevel.MEMORY_ONLY)
        tr.count()
        plans[p] = build_partials_multi(tr, specs)
        tree_aggregate_multi(plans[p], names, est_parts=p)  # warm

    best = {p: float("inf") for p in PARTS}
    for _ in range(PASSES):
        for p in PARTS:  # interleaved: every pass samples every variant
            t0 = time.monotonic()
            tree_aggregate_multi(plans[p], names, est_parts=p)
            best[p] = min(best[p], time.monotonic() - t0)
    spark.stop()
    print(json.dumps({str(p): round(t, 3) for p, t in best.items()}))


def main() -> None:
    from sparksketch import workerenv
    env = workerenv.configure(dict(os.environ))
    out = {}
    for cores in LEVELS:
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               str(cores)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["/usr/bin/taskset", "-c",
                   ",".join(str(i) for i in range(cores))] + cmd
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=1800, cwd=HERE)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        out[cores] = json.loads(line[-1]) if line else {"err": r.stderr[-800:]}
        print(cores, out[cores], flush=True)
    for p in PARTS:
        try:
            lo, hi = LEVELS[0], LEVELS[-1]
            eff = out[lo][str(p)] / ((hi / lo) * out[hi][str(p)])
            print(f"parts={p}: eff({lo}->{hi}) = {eff:.3f}")
        except (KeyError, TypeError):
            pass


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
