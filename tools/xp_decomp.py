"""Pinned per-level decomposition of the bench build pass (round-5 gate work).

For each level in the scaling pair (default 1 and 4, pinned exactly like
bench.py's children), times four nested variants of the SAME pass over the
SAME cached 16M-turn transcripts:

  scan     — cache scan + JVM hash projection, count-consumed (no Python)
  cross    — scan + identity mapInPandas (the Arrow crossing, no kernels)
  crossarr — scan + identity mapInArrow (is the pandas materialization the
             non-scaling part of the crossing?)
  full     — the real build pass (tree_aggregate_multi)

and prints per-variant best-of-passes plus the (lo -> hi) scaling ratio of
each component.  The component whose ratio is far below the others is the
non-scaling term the gate needs cut.

Usage: python tools/xp_decomp.py [--child CORES VARIANTS]
       (parent mode runs both levels via taskset-pinned children)
Env: XP_TURNS (default 16_000_000), XP_PASSES (default 4), XP_LEVELS "1,4".
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_TURNS = int(os.environ.get("XP_TURNS", "16000000"))
PASSES = int(os.environ.get("XP_PASSES", "4"))
LEVELS = [int(x) for x in os.environ.get("XP_LEVELS", "1,4").split(",")]


def child(cores: int, variants: list[str]) -> None:
    import pandas as pd
    import pyarrow as pa
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bench import BUILD_ARROW_BATCH, N_PARTS, _build_specs, _session
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = _build_specs(N_TURNS)
    names = list(specs)
    plan = build_partials_multi(tr, specs)
    # the DEDUPED projection — exactly what the real build crosses (three
    # columns at the bench specs, not the six undeduped prepare_exprs)
    exprs, seen = [], set()
    for name, (spec, cols) in specs.items():
        for batch_col, expr_key, c in spec.prepare_keyed_exprs(
                cols, prefix=f"{name}__"):
            if expr_key not in seen:
                seen.add(expr_key)
                exprs.append(c)
    prepared = tr.select(*exprs)
    pcols = prepared.schema

    def scan():
        # consume every prepared column JVM-side; no Python anywhere
        # (bit_xor for longs — summing 16M xxhash64 longs overflows ANSI;
        # plain sum for the double value column)
        prepared.select(*[
            (F.expr(f"bit_xor(`{f.name}`)") if f.dataType.simpleString()
             in ("bigint", "int") else F.sum(f.name)).alias(f.name)
            for f in pcols]).collect()

    def cross():
        def fn(batches):
            n = 0
            for pdf in batches:
                n += len(pdf)
            yield pd.DataFrame({"rows": [n]})
        prepared.mapInPandas(fn, schema="rows long") \
            .agg(F.sum("rows")).collect()

    def crossarr():
        def fn(batches):
            n = 0
            for b in batches:
                n += b.num_rows
            yield pa.RecordBatch.from_pydict({"rows": [n]})
        prepared.mapInArrow(fn, schema="rows long") \
            .agg(F.sum("rows")).collect()

    def full():
        tree_aggregate_multi(plan, names, est_parts=N_PARTS)

    table = {"scan": scan, "cross": cross, "crossarr": crossarr,
             "full": full}
    out = {"cores": cores}
    for k in variants:
        fn = table[k]
        fn()  # warm
        ts = []
        for _ in range(PASSES):
            t0 = time.monotonic()
            fn()
            ts.append(round(time.monotonic() - t0, 3))
        out[k] = {"best": min(ts), "reps": ts}
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    variants = (sys.argv[1].split(",") if len(sys.argv) > 1
                else ["scan", "cross", "crossarr", "full"])
    from bench import _pin_spec
    from sparksketch import workerenv
    env = workerenv.configure(dict(os.environ))
    res = {}
    for cores in LEVELS:
        cmd = ["/usr/bin/taskset", "-c", _pin_spec(cores), sys.executable,
               os.path.abspath(__file__), "--child", str(cores),
               ",".join(variants)]
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=3600, cwd=HERE)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"child {cores} failed: {out.stderr[-1500:]}")
        res[cores] = json.loads(lines[-1])
    lo, hi = LEVELS[0], LEVELS[-1]
    ratios = {}
    for k in variants:
        t_lo, t_hi = res[lo][k]["best"], res[hi][k]["best"]
        ratios[k] = round(t_lo / ((hi / lo) * t_hi), 3)
    print(json.dumps({"n_turns": N_TURNS, "levels": res,
                      "scaling_ratio": ratios}, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3].split(","))
    else:
        main()
