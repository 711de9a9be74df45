"""Where does the crossing's CPU go — JVM ArrowWriter or worker pandas?

Interleaves three identity passes over the bench build projection in ONE
pinned child (default 1 CPU, window-drift-proof):

  pandas_id — mapInPandas identity (arrow -> pandas per batch).
  arrow_id  — mapInArrow identity (no pandas; raw RecordBatches).
  arrow_np  — mapInArrow + .to_numpy() per column (what a numpy-kernel
              build actually needs).

If arrow_id ~= pandas_id, the cost is JVM-side (row->Arrow writer +
scan); if arrow_id is much cheaper, the worker-side pandas conversion is
the crossing's real cost and build_partials_multi should grow a
mapInArrow fast path.

Usage: python tools/xp_arrow_identity.py [--child N] ; XP_CORES (1).
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
CORES = int(os.environ.get("XP_CORES", "1"))


def child(cores: int) -> None:
    import pandas as pd
    import pyarrow as pa
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bench import BUILD_ARROW_BATCH, N_PARTS, _build_specs, _session
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = _build_specs(N_TURNS)
    exprs = []
    for name, (spec, cols) in specs.items():
        exprs.extend(spec.prepare_exprs(cols, prefix=f"{name}__"))
    prepared = tr.select(*exprs)

    def pandas_id():
        def fn(batches):
            n = 0
            for pdf in batches:
                n += len(pdf)
            yield pd.DataFrame({"rows": [n]})
        prepared.mapInPandas(fn, schema="rows long") \
            .agg(F.sum("rows")).collect()

    def arrow_id():
        def fn(batches):
            n = 0
            for b in batches:
                n += b.num_rows
            yield pa.RecordBatch.from_pydict({"rows": [n]})
        prepared.mapInArrow(fn, schema="rows long") \
            .agg(F.sum("rows")).collect()

    def arrow_np():
        def fn(batches):
            n = 0
            for b in batches:
                for i in range(b.num_columns):
                    arr = b.column(i).to_numpy(zero_copy_only=False)
                    n += len(arr)
            yield pa.RecordBatch.from_pydict({"rows": [n]})
        prepared.mapInArrow(fn, schema="rows long") \
            .agg(F.sum("rows")).collect()

    variants = {"pandas_id": pandas_id, "arrow_id": arrow_id,
                "arrow_np": arrow_np}
    for fn in variants.values():
        fn()
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
    cmd = ["/usr/bin/taskset", "-c", _pin_spec(CORES), sys.executable,
           os.path.abspath(__file__), "--child", str(CORES)]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=2400, cwd=HERE)
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    print(lines[-1] if lines else f"FAILED: {out.stderr[-1500:]}")


if __name__ == "__main__":
    main()
