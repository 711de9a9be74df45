"""A/B residual JVM-side knobs for the build's non-scaling serializer term.

tools/xp_serializer_cpu.py attributed the (1->4) gap to the row-wise
Arrow serializer's latency-bound load/store chain losing IPC under
concurrency.  Two knobs not yet tried target exactly that memory path:

  thp     -XX:+UseTransparentHugePages — madvise-THP the JVM heap
          (UnsafeRow reads + cached columnar batches live there); fewer
          TLB misses on a latency-bound pointer chain.
  nocomp  spark.sql.inMemoryColumnarStorage.compressed=false — the
          cached input decompresses per pass; skipping it trades memory
          (plentiful) for CPU.
  cbatch  spark.sql.inMemoryColumnarStorage.batchSize 10k -> 64k —
          fewer per-batch boundaries in the cache scan.

Each (config, level) runs in a FRESH pinned subprocess+JVM (JVM opts
need a new JVM), alternating configs across children so host volatility
hits all configs equally; min-of-passes per child, min-of-children per
config.

Usage: python tools/xp_jvmknobs.py [hi|both]
Env: XP_TURNS (default 8M), XP_PASSES (default 4), XP_ROUNDS (default 2).

MEASURED (2026-08-19, hi level local[4] pinned, 8M turns, 2 rounds,
min-of-passes then min-of-rounds): base 3.524, thp 3.809, nocomp 3.572,
cbatch 3.673, all-three 3.471 — every delta is inside the 3.47-3.91
cross-window spread, with no knob winning both rounds.  All three are
DEAD ENDS, consistent with tools/xp_serializer_cpu.py's attribution:
the residual is the serializer's per-value load/store chain losing IPC
under concurrency, not TLB pressure, cache-decompress CPU, or cache
batch boundaries.
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
ROUNDS = int(os.environ.get("XP_ROUNDS", "2"))

CONFIGS: dict[str, dict[str, str]] = {
    "base": {},
    "thp": {"spark.driver.extraJavaOptions":
            "-XX:+UseTransparentHugePages"},
    "nocomp": {"spark.sql.inMemoryColumnarStorage.compressed": "false"},
    "cbatch": {"spark.sql.inMemoryColumnarStorage.batchSize": "65536"},
    "all": {"spark.driver.extraJavaOptions":
            "-XX:+UseTransparentHugePages",
            "spark.sql.inMemoryColumnarStorage.compressed": "false",
            "spark.sql.inMemoryColumnarStorage.batchSize": "65536"},
}


def child(cores: int, cfg_name: str) -> None:
    from pyspark import StorageLevel
    from pyspark.sql import SparkSession

    from bench import BUILD_ARROW_BATCH, N_PARTS, _build_specs, _session
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    # apply overrides BEFORE the JVM starts (bench._session getOrCreate's)
    b = SparkSession.builder
    for k, v in CONFIGS[cfg_name].items():
        b = b.config(k, v)
    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    specs = _build_specs(N_TURNS)
    names = list(specs)
    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    plan = build_partials_multi(tr, specs)
    tree_aggregate_multi(plan, names, est_parts=N_PARTS)  # warm
    best = float("inf")
    for _ in range(PASSES):
        t0 = time.monotonic()
        tree_aggregate_multi(plan, names, est_parts=N_PARTS)
        best = min(best, time.monotonic() - t0)
    spark.stop()
    print(json.dumps({"sec": round(best, 3)}))


def main() -> None:
    from sparksketch import workerenv
    env = workerenv.configure(dict(os.environ))
    levels = [4] if (len(sys.argv) > 1 and sys.argv[1] == "hi") else [1, 4]
    best: dict[tuple, float] = {}
    for rnd in range(ROUNDS):
        for cores in levels:
            for name in CONFIGS:
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--child", str(cores), name]
                if os.path.exists("/usr/bin/taskset"):
                    cmd = ["/usr/bin/taskset", "-c",
                           ",".join(str(i) for i in range(cores))] + cmd
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   env=env, timeout=1800, cwd=HERE)
                line = [ln for ln in r.stdout.splitlines()
                        if ln.startswith("{")]
                if not line:
                    print(f"r{rnd} c{cores} {name}: CHILD FAILED "
                          f"{r.stderr[-500:]}", flush=True)
                    continue
                sec = json.loads(line[-1])["sec"]
                key = (cores, name)
                best[key] = min(best.get(key, float("inf")), sec)
                print(f"r{rnd} c{cores} {name}: {sec}", flush=True)
    print(json.dumps({f"c{c}_{n}": v for (c, n), v in best.items()}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
    else:
        main()
