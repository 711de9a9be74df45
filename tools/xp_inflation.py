"""Which stage of the build inflates per-task under concurrency?

Phases timed at one parallelism level (same 4M-turn cached input and 64
partitions as bench):
  jvm_scan   — scan + hash projection + JVM-side sum (no Python at all)
  crossing   — scan + projection + mapInPandas that only counts rows
  build      — the full 4-sketch build (bench workload)

Usage: python tools/xp_inflation.py <cores>
Prints one JSON line with 2 reps per phase.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    cores = int(sys.argv[1])
    import bench
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    spark = bench._session(cores, arrow_batch=bench.BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, bench.N_TURNS,
                                partitions=bench.N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = bench._build_specs(bench.N_TURNS)
    names = list(specs)
    plan = build_partials_multi(tr, specs)

    # identical projection to the build's, JVM-side only
    prepared_cols = [f.name for f in plan.schema.fields]  # not the same —
    # rebuild the projection the way build_partials_multi does
    from sparksketch.agg import build_partials_multi as _b
    # jvm_scan: hash projection + sum aggregate (keeps all exprs alive)
    jvm_df = tr.select(F.xxhash64("conv_id").alias("a"),
                       F.xxhash64("conv_id", "tool").alias("b"),
                       F.xxhash64("tool").alias("c"),
                       F.col("turn_idx"))
    jvm_agg = jvm_df.select(
        F.sum(F.pmod(F.col("a"), F.lit(1_000_003)))
        + F.sum(F.pmod(F.col("b"), F.lit(1_000_003)))
        + F.sum(F.pmod(F.col("c"), F.lit(1_000_003)))
        + F.sum("turn_idx"))

    def count_fn(batches):
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"n": [n]})

    crossing = jvm_df.mapInPandas(count_fn, schema="n long")

    def timeit(fn):
        fn()  # warm
        reps = []
        for _ in range(2):
            t0 = time.monotonic()
            fn()
            reps.append(round(time.monotonic() - t0, 3))
        return reps

    out = {"cores": cores}
    out["jvm_scan"] = timeit(lambda: jvm_agg.collect())
    out["crossing"] = timeit(
        lambda: crossing.groupBy().sum().collect())
    out["build"] = timeit(
        lambda: tree_aggregate_multi(plan, names, est_parts=bench.N_PARTS))
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
