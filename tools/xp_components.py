"""Which component of the one-pass build fails to scale 1->4?

Interleaved inside one pinned child per level (window-drift-proof pairs):

  jvm_hash  — scan + the full JVM-side hash/value projection, reduced
              JVM-side (xxhash64 + count, no Python at all).
  crossing  — the same projection through an identity mapInPandas
              (adds Arrow encode/socket/decode + worker loop).
  hll       — one-sketch build (16 KB state, cheap kernel).
  bloom     — one-sketch build (983 KB bitmap, k=20 EDH scatter).
  cms       — one-sketch build (512 KB table, d=4 EDH scatter).
  kll       — one-sketch build (quantile compactions).
  full      — the real 4-sketch build + merge (bench workload).

Usage: python tools/xp_components.py [--child N]
Env: XP_TURNS (8M), XP_PASSES (3 per variant).
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
PASSES = int(os.environ.get("XP_PASSES", "3"))


def child(cores: int) -> None:
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

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

    full_plan = build_partials_multi(tr, specs)
    single = {n: build_partials_multi(tr, {n: specs[n]}) for n in names}

    exprs = []
    for name, (spec, cols) in specs.items():
        exprs.extend(spec.prepare_exprs(cols, prefix=f"{name}__"))
    prepared = tr.select(*exprs)
    first = prepared.columns[0]

    def identity():
        def fn(batches):
            n = 0
            for pdf in batches:
                n += len(pdf)
            yield pd.DataFrame({"rows": [n]})
        prepared.mapInPandas(fn, schema="rows long") \
            .agg(F.sum("rows")).collect()

    variants = {
        "jvm_hash": lambda: prepared.agg(
            F.expr(f"bit_xor(xxhash64({first}))"), F.count("*")).collect(),
        "crossing": identity,
        "hll": lambda: tree_aggregate_multi(
            single["hll_conv"], ["hll_conv"], est_parts=N_PARTS),
        "bloom": lambda: tree_aggregate_multi(
            single["bloom_conv_tool"], ["bloom_conv_tool"],
            est_parts=N_PARTS),
        "cms": lambda: tree_aggregate_multi(
            single["cms_tool"], ["cms_tool"], est_parts=N_PARTS),
        "kll": lambda: tree_aggregate_multi(
            single["kll_turn_idx"], ["kll_turn_idx"], est_parts=N_PARTS),
        "full": lambda: tree_aggregate_multi(full_plan, names,
                                             est_parts=N_PARTS),
    }
    for fn in variants.values():
        fn()  # warm every plan
    out = {"cores": cores}
    times = {k: [] for k in variants}
    for _ in range(PASSES):
        for k, fn in variants.items():
            t0 = time.monotonic()
            fn()
            times[k].append(round(time.monotonic() - t0, 3))
    for k in variants:
        out[k] = min(times[k])
        out[f"{k}_reps"] = times[k]
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
    keys = [k for k in res[1] if not k.endswith("_reps") and k != "cores"]
    print(json.dumps({f"eff_{k}": round(res[1][k] / (4 * res[4][k]), 3)
                      for k in keys}, indent=1))


if __name__ == "__main__":
    main()
