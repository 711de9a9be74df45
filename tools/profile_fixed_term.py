"""Phase-split the bench build at one parallelism level.

The (1,4) scaling pair shows ~0.9 s of level-independent time
(t = fixed + work/N fit).  This tool decomposes one timed
tree_aggregate_multi pass into:

  - job+collect: the Spark job (scan -> mapInPandas build) plus the
    Arrow collect of the 64 partial rows (~1.5 MB each) to the driver
  - driver fold:  merge_blob_list over the collected blobs, per sketch

Usage: python tools/profile_fixed_term.py <cores>
Prints one JSON line.  Run under the same workerenv as bench children:
the caller (or bench._run_child) sets PYTHONPATH/sitecustomize.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

sys.path.insert(0, HERE)


def main() -> None:
    cores = int(sys.argv[1])
    import bench
    from pyspark import StorageLevel
    from sparksketch.agg import (_collect_partials, build_partials_multi,
                                 merge_blob_list)
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
    # warm pass (codegen + worker pool), identical to bench._child_build
    pdf = _collect_partials(plan)
    for n in names:
        merge_blob_list(bytes(b) for b in pdf[n])
    out = {"cores": cores, "reps": []}
    for _ in range(2):
        t0 = time.monotonic()
        pdf = _collect_partials(plan)
        t1 = time.monotonic()
        blob_bytes = int(sum(pdf[n].map(len).sum() for n in names))
        for n in names:
            merge_blob_list(bytes(b) for b in pdf[n])
        t2 = time.monotonic()
        out["reps"].append({
            "job_collect_s": round(t1 - t0, 3),
            "fold_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "collected_mb": round(blob_bytes / 1e6, 1),
        })
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
