"""Is the crossing's non-scaling term JVM garbage collection?

Times the identity crossing and the full build at each pinned level and
pairs every pass with the JVM-wide GC collection-time delta (GC MXBeans
via py4j).  A stop-the-world pause stalls ALL executor threads, so its
wall cost is the same at every level while the work it stalls is N times
bigger — the signature of a non-proportional term.

Usage: python tools/xp_gc.py [--child N]
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


def _gc_ms(spark) -> int:
    beans = spark._jvm.java.lang.management.ManagementFactory \
        .getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime()
               for i in range(beans.size()))


def child(cores: int) -> None:
    import pandas as pd
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
    exprs = []
    for name, (spec, cols) in specs.items():
        exprs.extend(spec.prepare_exprs(cols, prefix=f"{name}__"))
    prepared = tr.select(*exprs)

    def identity():
        def fn(batches):
            n = 0
            for pdf in batches:
                n += len(pdf)
            yield pd.DataFrame({"rows": [n]})
        prepared.mapInPandas(fn, schema="rows long") \
            .agg(F.sum("rows")).collect()

    variants = {
        "crossing": identity,
        "full": lambda: tree_aggregate_multi(plan, names,
                                             est_parts=N_PARTS),
    }
    for fn in variants.values():
        fn()
    out = {"cores": cores}
    for k, fn in variants.items():
        ts, gcs = [], []
        for _ in range(PASSES):
            g0 = _gc_ms(spark)
            t0 = time.monotonic()
            fn()
            ts.append(round(time.monotonic() - t0, 3))
            gcs.append(_gc_ms(spark) - g0)
        out[k] = min(ts)
        out[f"{k}_reps"] = ts
        out[f"{k}_gc_ms"] = gcs
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    from bench import _pin_spec
    from sparksketch import workerenv
    env = workerenv.configure(dict(os.environ))
    for cores in (1, 4):
        cmd = ["/usr/bin/taskset", "-c", _pin_spec(cores), sys.executable,
               os.path.abspath(__file__), "--child", str(cores)]
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=2400, cwd=HERE)
        lines = [ln for ln in out.stdout.strip().splitlines()
                 if ln.startswith("{")]
        print(lines[-1] if lines else f"FAILED: {out.stderr[-1500:]}",
              flush=True)


if __name__ == "__main__":
    main()
