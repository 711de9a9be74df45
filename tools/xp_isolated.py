"""Prototype of the round-5 bench measurement core: each (rep, level) runs
in a FRESH subprocess (own python, own JVM), so no cross-rep JVM heap /
page-cache / worker-pool state leaks into later reps — round-4's in-process
interleaving showed monotonic degradation (driver rep efficiencies 0.454 ->
0.343, and our local t8 series 2.43 -> 22 s in one process).

Usage: python tools/xp_isolated.py [n_turns] [reps] [lo] [hi]
Child mode: python tools/xp_isolated.py --child <cores> <n_turns>
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def child(cores: int, n_turns: int, parts: int = 128) -> None:
    from bench import _build_specs, _cpu_times, _session
    from pyspark import StorageLevel
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    batch = os.environ.get("XP_ARROW_BATCH")
    if batch:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master(f"local[{cores}]")
                 .appName(f"xp-{cores}")
                 .config("spark.sql.shuffle.partitions", str(cores))
                 .config("spark.default.parallelism", str(cores))
                 .config("spark.sql.adaptive.enabled", "true")
                 .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                         batch)
                 .config("spark.driver.memory", "48g")
                 .config("spark.ui.enabled", "false")
                 .config("spark.ui.showConsoleProgress", "false")
                 .getOrCreate())
    else:
        spark = _session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    level = StorageLevel.MEMORY_ONLY if os.environ.get("XP_MEM_ONLY") \
        else StorageLevel.MEMORY_AND_DISK
    tr = synthesize_transcripts(spark, n_turns, partitions=parts) \
        .persist(level)
    tr.count()
    specs = _build_specs(n_turns)
    if os.environ.get("XP_FULL_WARM"):
        tree_aggregate_multi(build_partials_multi(tr, specs), list(specs))
    else:
        warm = synthesize_transcripts(spark, max(n_turns // 100, 1000),
                                      partitions=parts)
        tree_aggregate_multi(build_partials_multi(warm, specs), list(specs))
    plan = build_partials_multi(tr, specs)
    s0, j0 = _cpu_times()
    t0 = time.monotonic()
    tree_aggregate_multi(plan, list(specs))
    dt = time.monotonic() - t0
    s1, j1 = _cpu_times()
    tr.unpersist()
    spark.stop()
    print(json.dumps({"sec": dt,
                      "steal": round(100.0 * (s1 - s0) / max(j1 - j0, 1), 1)}))


def run(cores: int, n_turns: int, parts: int = 128) -> dict:
    env = dict(os.environ)
    env["SPARKSKETCH_ZIPIMPORT_FIX"] = "1"
    env["PYTHONPATH"] = os.path.join(HERE, "tools", "inst")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(cores), str(n_turns), str(parts)],
        capture_output=True, text=True, env=env, timeout=900)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]) if len(sys.argv) > 4 else 128)
        return
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    parts = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    rows = []
    for rep in range(reps):
        a = run(lo, n_turns, parts)
        b = run(hi, n_turns, parts)
        eff = a["sec"] / ((hi / lo) * b["sec"])
        rows.append({"rep": rep, f"t{lo}": round(a["sec"], 2),
                     f"t{hi}": round(b["sec"], 2),
                     "steal_lo": a["steal"], "steal_hi": b["steal"],
                     "eff": round(eff, 3)})
        print(json.dumps(rows[-1]), flush=True)
    print("effs:", [r["eff"] for r in rows])


if __name__ == "__main__":
    main()
