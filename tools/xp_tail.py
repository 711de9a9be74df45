"""Measure the NON-SCALING tail of the bench build job at the (1,4) pair.

Hypothesis (round 5): t_level = S/level + T where T is the level-independent
tail — the driver-side collect of 64 x ~1.5 MB partial blobs plus the serial
driver merge.  With S ~= 12 s and T ~= 1 s, eff(1->4) = (S+T)/(4*(S/4+T))
~= 0.81 — exactly the plateau BENCH.md records.  This tool separates the
scaling scan/build time from the tail by timing, in the SAME pinned child:

  build_only — the partials plan reduced JVM-side (sum(rows)): blobs are
               built and serialized by the Python workers but their bytes
               never ship to the driver.
  full       — tree_aggregate_multi (ships blobs + driver merge).
  collect    — _collect_partials alone on a cached partials frame (the
               ship cost, re-run).
  dmerge     — merge_blob_list on the collected pdf (driver CPU only).

Usage: python tools/xp_tail.py            # parent: runs pinned children
       python tools/xp_tail.py --child N  # one pinned child at N cores
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


def child(cores: int) -> None:
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bench import BUILD_ARROW_BATCH, _build_specs, _session
    from sparksketch.agg import (_collect_partials, build_partials_multi,
                                 merge_blob_list, tree_aggregate_multi)
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = _build_specs(N_TURNS)
    names = list(specs)
    plan = build_partials_multi(tr, specs)
    tree_aggregate_multi(plan, names, est_parts=N_PARTS)  # warm

    def best(fn):
        ts = []
        for _ in range(PASSES):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return round(min(ts), 3), [round(t, 3) for t in ts]

    out = {}
    out["build_only"], out["build_only_reps"] = best(
        lambda: plan.agg(F.sum("rows")).collect())
    out["full"], out["full_reps"] = best(
        lambda: tree_aggregate_multi(plan, names, est_parts=N_PARTS))
    pdf_holder = {}
    out["collect"], out["collect_reps"] = best(
        lambda: pdf_holder.__setitem__("pdf", _collect_partials(plan)))
    pdf = pdf_holder["pdf"]
    out["dmerge"], out["dmerge_reps"] = best(
        lambda: {n: merge_blob_list(bytes(b) for b in pdf[n])
                 for n in names})
    out["blob_mb"] = round(sum(
        pdf[n].map(len).sum() for n in names) / 1e6, 1)
    out["cores"] = cores
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
                             timeout=1800, cwd=HERE)
        lines = [ln for ln in out.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            raise RuntimeError(f"child {cores} failed: {out.stderr[-2000:]}")
        rec = json.loads(lines[-1])
        res[cores] = rec
        print(json.dumps(rec), flush=True)
    t1, t4 = res[1]["full"], res[4]["full"]
    print(json.dumps({
        "eff_full": round(t1 / (4 * t4), 3),
        "eff_build_only": round(
            res[1]["build_only"] / (4 * res[4]["build_only"]), 3),
        "tail_hi_sec": round(t4 - res[4]["build_only"], 3),
        "tail_lo_sec": round(t1 - res[1]["build_only"], 3),
    }, indent=1))


if __name__ == "__main__":
    main()
