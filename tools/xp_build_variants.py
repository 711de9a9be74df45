"""Experiment: bench-build variants at one parallelism level.

Variants (env XP_INPUT, XP_COLLECT):
  input:   cache   — current bench path (synthesize -> persist MEMORY_ONLY)
           parquet — synthesize once, write 64-file parquet to /tmp, read it
                     back with splits pinned to one-file-per-partition
           live    — no materialization: scan IS the codegen generator
  collect: pandas  — _collect_partials (toPandas)
           arrow   — DataFrame.toArrow(), fold from buffer views

Prints one JSON line with the phase decomposition of 2 timed reps.

Usage: python tools/xp_build_variants.py <cores> <input> <collect>
"""
import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

PQ_DIR = "/tmp/xp_transcripts_pq"


def main() -> None:
    cores = int(sys.argv[1])
    input_kind = sys.argv[2]
    collect_kind = sys.argv[3]
    import bench
    from pyspark import StorageLevel
    from pyspark.sql import SparkSession
    from sparksketch.agg import (_collect_partials, build_partials_multi,
                                 merge_blob_list)
    from sparksketch.transcripts import synthesize_transcripts

    builder = (SparkSession.builder.master(f"local[{cores}]")
               .appName(f"xp-{cores}")
               .config("spark.sql.shuffle.partitions", str(cores))
               .config("spark.default.parallelism", str(cores))
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(bench.BUILD_ARROW_BATCH))
               .config("spark.driver.memory", "48g")
               .config("spark.ui.enabled", "false")
               .config("spark.ui.showConsoleProgress", "false"))
    if input_kind == "parquet":
        # pin splits: one file -> one partition regardless of cores
        builder = (builder
                   .config("spark.sql.files.maxPartitionBytes", str(64 << 20))
                   .config("spark.sql.files.openCostInBytes", str(64 << 20)))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if input_kind == "cache":
        tr = synthesize_transcripts(spark, bench.N_TURNS,
                                    partitions=bench.N_PARTS) \
            .persist(StorageLevel.MEMORY_ONLY)
        tr.count()
    elif input_kind == "parquet":
        if not os.path.exists(PQ_DIR):
            synthesize_transcripts(spark, bench.N_TURNS,
                                   partitions=bench.N_PARTS) \
                .write.mode("overwrite").parquet(PQ_DIR)
        tr = spark.read.parquet(PQ_DIR)
    else:
        tr = synthesize_transcripts(spark, bench.N_TURNS,
                                    partitions=bench.N_PARTS)

    specs = bench._build_specs(bench.N_TURNS)
    names = list(specs)
    plan = build_partials_multi(tr, specs)
    n_parts = plan.rdd.getNumPartitions()

    def run_once():
        t0 = time.monotonic()
        if collect_kind == "arrow":
            tbl = plan.toArrow()
            t1 = time.monotonic()
            pids = tbl["pid"].to_pylist()
            order = sorted(range(len(pids)), key=lambda i: pids[i])
            blobs = {}
            for n in names:
                col = tbl[n].combine_chunks()
                blobs[n] = merge_blob_list(
                    memoryview(col[i].as_py()) for i in order)
            t2 = time.monotonic()
        else:
            pdf = _collect_partials(plan)
            t1 = time.monotonic()
            blobs = {n: merge_blob_list(bytes(b) for b in pdf[n])
                     for n in names}
            t2 = time.monotonic()
        return round(t1 - t0, 3), round(t2 - t1, 3), blobs

    run_once()  # warm
    reps = []
    blobs = None
    for _ in range(2):
        jc, fold, blobs = run_once()
        reps.append({"job_collect_s": jc, "fold_s": fold,
                     "total_s": round(jc + fold, 3)})
    from sparksketch.sketches import sketch_from_bytes
    hll = sketch_from_bytes(bytes(blobs["hll_conv"]))
    spark.stop()
    print(json.dumps({"cores": cores, "input": input_kind,
                      "collect": collect_kind, "n_parts": n_parts,
                      "reps": reps, "hll_estimate": hll.estimate()}))


if __name__ == "__main__":
    main()
