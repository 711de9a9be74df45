"""Knob matrix for the crossing's hi-level idle time (round-5 gate work).

tools/xp_decomp.py isolated the scaling gap to the Arrow crossing: the JVM
scan scales 0.9 (1->4 pinned) but the identity crossing only ~0.45, and the
full build rides the crossing (kernels pipeline behind it).  At the hi
level the crossing leaves ~half its CPU budget idle — so this script varies
the things that could serialize a per-task JVM-writer/Python-worker
pipeline, hi level only (fast passes), one session per config:

  arrow batch   16384 vs 131072   (per-batch handshake amortization)
  buffer.size   64 KiB vs 1 MiB   (JVM->worker socket write buffering —
                                   a writer that blocks mid-batch cannot
                                   run ahead of the worker)
  partitions    16 vs 64          (more in-flight tasks = more overlap)

Usage: python tools/xp_hiknobs.py   (parent; pins children like bench.py)
Env: XP_TURNS (default 16M), XP_PASSES (default 3), XP_CORES (default 4).
"""
from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_TURNS = int(os.environ.get("XP_TURNS", "16000000"))
PASSES = int(os.environ.get("XP_PASSES", "3"))
CORES = int(os.environ.get("XP_CORES", "4"))


def child(cores: int, batch: int, buf: int) -> None:
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench import _build_specs
    from sparksketch.transcripts import synthesize_transcripts

    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName(f"xp-hiknobs-{cores}")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.default.parallelism", str(cores))
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     str(batch))
             .config("spark.buffer.size", str(buf))
             .config("spark.driver.memory", "48g")
             .config("spark.task.maxDirectResultSize", "64m")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = {"cores": cores, "batch": batch, "buffer": buf}
    specs = _build_specs(N_TURNS)
    for parts in (16, 64):
        tr = synthesize_transcripts(spark, N_TURNS, partitions=parts) \
            .persist(StorageLevel.MEMORY_ONLY)
        tr.count()
        exprs, seen = [], set()
        for name, (spec, cols) in specs.items():
            for batch_col, expr_key, c in spec.prepare_keyed_exprs(
                    cols, prefix=f"{name}__"):
                if expr_key not in seen:
                    seen.add(expr_key)
                    exprs.append(c)
        prepared = tr.select(*exprs)

        def cross(src=prepared):
            def fn(batches):
                n = 0
                for pdf in batches:
                    n += len(pdf)
                yield pd.DataFrame({"rows": [n]})
            src.mapInPandas(fn, schema="rows long") \
                .agg(F.sum("rows")).collect()

        cross()  # warm
        ts = []
        for _ in range(PASSES):
            t0 = time.monotonic()
            cross()
            ts.append(round(time.monotonic() - t0, 3))
        out[f"p{parts}"] = {"best": min(ts), "reps": ts}
        tr.unpersist()
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    from bench import _pin_spec
    from sparksketch import workerenv
    env = workerenv.configure(dict(os.environ))
    res = []
    for batch, buf in itertools.product((16384, 131072),
                                        (65536, 1048576)):
        cmd = ["/usr/bin/taskset", "-c", _pin_spec(CORES), sys.executable,
               os.path.abspath(__file__), "--child", str(CORES),
               str(batch), str(buf)]
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=3600, cwd=HERE)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"child failed: {out.stderr[-1500:]}")
        rec = json.loads(lines[-1])
        res.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"n_turns": N_TURNS, "cores": CORES, "all": res},
                     indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
