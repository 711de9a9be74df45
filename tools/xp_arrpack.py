"""Does array-packing the value column beat the per-row Arrow serializer?

The KLL build job's cost is ~pure crossing (tools/xp_klljob.py: identity
6.03 s vs full KLL 6.07 s at pinned local[1] / 8M rows).  The row-wise
serializer pays per-ROW overhead (iterator, null checks, per-field
virtual dispatch) on top of per-value work.  Packing each partition's
values into ONE array row (``groupBy(spark_partition_id())
.agg(collect_list(...))`` — partial agg does all the work map-side, the
exchange ships 16 fat rows) turns 8M row-writes into 16 array-writes
whose element loop is tighter.  Variants, interleaved per pinned child:

  ident   — per-row identity crossing (baseline, = xp_klljob ident)
  arr     — collect_list(int) pack -> mapInArrow element count
  arrd    — collect_list(double) pack (KLL consumes doubles)

Usage: python tools/xp_arrpack.py ; env XP_TURNS/XP_PASSES/XP_LEVELS.

MEASURED (2026-08-19, 8M rows, pinned, interleaved):
  level   ident  arr    arrd
  1       6.232  2.801  3.610
  4       2.212  1.207  1.507
Array-packing halves-to-thirds the ABSOLUTE crossing cost (the
element loop beats the per-row path decisively) but the packed job's
own (1->4) scaling is WORSE (0.58 vs 0.70): the collect_list agg's
allocation churn and the element serializer are bus-bound under
concurrency.  Useful when a raw value column must cross at all;
the bench's final shape avoids the raw crossing entirely.
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
LEVELS = [int(x) for x in os.environ.get("XP_LEVELS", "1,4").split(",")]


def child(cores: int) -> None:
    import pandas as pd
    import pyarrow as pa
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bench import BUILD_ARROW_BATCH, N_PARTS, _session
    from sparksketch.transcripts import synthesize_transcripts

    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    proj = tr.select(F.col("turn_idx").cast("double").alias("value"))

    def identity(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    ident = proj.mapInPandas(identity, schema="n long")

    def count_elems(batches):
        for rb in batches:
            col = rb.column(rb.schema.get_field_index("vs"))
            n = len(col.values)  # flattened element child array
            yield pa.RecordBatch.from_pydict({"n": pa.array([n])})

    packs = {}
    for name, cast in (("arr", "int"), ("arrd", "double")):
        packed = (tr.select(F.col("turn_idx").cast(cast).alias("v"))
                  .groupBy(F.spark_partition_id().alias("pid"))
                  .agg(F.collect_list("v").alias("vs")))
        packs[name] = packed.mapInArrow(count_elems, schema="n long")

    variants = {
        "ident": lambda: ident.agg(F.sum("n")).collect(),
        "arr": lambda: packs["arr"].agg(F.sum("n")).collect(),
        "arrd": lambda: packs["arrd"].agg(F.sum("n")).collect(),
    }
    for k, fn in variants.items():
        r = fn()
        assert r[0][0] == N_TURNS, (k, r)
    times = {k: [] for k in variants}
    for _ in range(PASSES):
        for k, fn in variants.items():
            t0 = time.monotonic()
            fn()
            times[k].append(round(time.monotonic() - t0, 3))
    print(json.dumps({"cores": cores,
                      "best": {k: min(v) for k, v in times.items()},
                      "all": times}))


def main() -> None:
    out = {}
    for cores in LEVELS:
        pin = f"0-{cores - 1}" if cores > 1 else "0"
        r = subprocess.run(
            ["taskset", "-c", pin, sys.executable, os.path.abspath(__file__),
             "--child", str(cores)],
            capture_output=True, text=True,
            env={**os.environ, "PYTHONPATH": HERE})
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            out[cores] = json.loads(line)
        except Exception:
            print(r.stdout, r.stderr[-2000:], file=sys.stderr)
            raise
        print(cores, out[cores]["best"], flush=True)
    if len(out) == 2:
        lo, hi = sorted(out)
        for k in out[lo]["best"]:
            a, b = out[lo]["best"][k], out[hi]["best"][k]
            print(f"eff[{k}] ({lo}->{hi}): {a / ((hi / lo) * b):.3f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
