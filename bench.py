"""Benchmark harness: sketch build+merge throughput (turns/sec) and headline
query latencies, at two parallelism levels (local[N] and local[4N] as the
sandbox stand-in for N vs 4N executors, per BASELINE.md §C).

Prints ONE JSON line:
  {"metric": ..., "value": <headline suite seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "throughput": {...}, "scaling": {...}}

and records the human-readable table in BENCH.md.

Design notes for the scaling measurement (north_rule: efficiency >= 0.8
from N to 4N):
- The SAME input (same row count, same fixed partitioning) is processed at
  both parallelism levels; only executor-thread count changes — the honest
  stand-in for N vs 4N executors on one box.
- The workload is the one-pass multi-sketch build (HLL + Bloom + CMS + KLL
  from a single scan/Arrow crossing) + canonical tree merge: per-partition
  work is pure vectorized NumPy, partials are KB-scale, so the job is
  embarrassingly parallel by construction.
- A small warm-up pass first spins up the Python worker pool so worker
  fork/import cost is not billed to the timed region.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TURNS (default 4_000_000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("SPARK_GRAFT_TURNS", "4000000"))
# fixed across parallelism levels so per-task work is identical
N_PARTS = int(os.environ.get("SPARK_GRAFT_PARTS", "128"))


def _session(cores: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cores}]")
            .appName(f"sparksketch-bench-{cores}")
            .config("spark.sql.shuffle.partitions", str(cores))
            .config("spark.default.parallelism", str(cores))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
            .config("spark.driver.memory", "48g")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate())


def _build_specs(n_turns: int):
    from sparksketch.agg import BloomSpec, CMSSpec, HLLSpec, KLLSpec
    from sparksketch.shape import Shape
    n_convs = max(n_turns // 50, 1)
    # bloom sized for the ~n_convs*12 distinct (conv_id, tool) pairs
    bloom_shape = Shape.from_np(max(16 * n_convs, 1 << 14), 1e-6)
    return {
        "hll_conv": (HLLSpec(p=14), ["conv_id"]),
        "bloom_conv_tool": (BloomSpec(bloom_shape), ["conv_id", "tool"]),
        "cms_tool": (CMSSpec(w=1 << 16, d=4), ["tool"]),
        "kll_turn_idx": (KLLSpec(k=400, col="turn_idx"), ["conv_id"]),
    }


def _build_suite(spark, n_turns: int) -> dict:
    """North-rule workload: ONE pass over the transcripts builds four sketch
    kinds (single scan, single Arrow crossing), then canonical tree merge.
    Returns timing + sanity estimates."""
    from pyspark import StorageLevel
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.sketches import sketch_from_bytes
    from sparksketch.transcripts import synthesize_transcripts

    tr = synthesize_transcripts(spark, n_turns, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    tr.count()  # materialize generation outside the timed region

    specs = _build_specs(n_turns)
    # warm-up: spin up the Python worker pool on a 1%-scale slice
    warm = synthesize_transcripts(spark, max(n_turns // 100, 1000),
                                  partitions=N_PARTS)
    tree_aggregate_multi(build_partials_multi(warm, specs), list(specs))

    t0 = time.monotonic()
    blobs = tree_aggregate_multi(build_partials_multi(tr, specs), list(specs))
    build_sec = time.monotonic() - t0

    hll = sketch_from_bytes(blobs["hll_conv"])
    tr.unpersist()
    return {
        "build_sec": build_sec,
        "turns_per_sec": n_turns / build_sec,
        "hll_estimate": hll.estimate(),
    }


def _headline_queries(spark, sf_dir: str) -> dict:
    """sf-dir query latencies (the driver-graded suite)."""
    import __spark_entry__ as entry
    qs = entry.queries()
    headline = ["bloom_semijoin_customers", "kmv_distinct_convs",
                "cms_tool_counts", "kll_lineitem_qty_quantiles",
                "hll_distinct_users_bound", "layered_daily_distinct_users",
                "setops_role_similarity", "dedup_exact_documents",
                "ngram_jaccard_pairs", "ann_topk_cosine",
                "minhash_lsh_candidates", "simhash_near_dups",
                "stable_dedup_partitions"]
    out = {}
    for name in headline:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    results: dict = {"sf": float(sf) if sf.replace(".", "").isdigit() else sf}

    # --- scaling: same input, same partitioning, N vs 4N cores ------------
    lo_cores = max(CPUS // 4, 1)
    scaling = {}
    for cores in (lo_cores, CPUS):
        spark = _session(cores)
        spark.sparkContext.setLogLevel("ERROR")
        suite = _build_suite(spark, N_TURNS)
        scaling[f"c{cores}"] = {
            "build_sec": round(suite["build_sec"], 3),
            "turns_per_sec": round(suite["turns_per_sec"]),
        }
        if cores == CPUS:
            queries = _headline_queries(spark, SF_DIR)
        spark.stop()
    thr_lo = scaling[f"c{lo_cores}"]["turns_per_sec"]
    thr_hi = scaling[f"c{CPUS}"]["turns_per_sec"]
    eff = thr_hi / ((CPUS / lo_cores) * thr_lo)
    scaling["efficiency"] = round(eff, 3)
    scaling["n_turns"] = N_TURNS
    scaling["input_partitions"] = N_PARTS

    total = round(sum(queries.values()), 3)
    results.update({
        "metric": "headline sketch-query suite wall time (sf dir) + "
                  "one-pass 4-sketch build/merge throughput at two "
                  "parallelism levels",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "throughput": {"turns_per_sec_c%d" % CPUS: thr_hi,
                       "turns_per_sec_c%d" % lo_cores: thr_lo},
        "scaling": scaling,
    })

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.md"), "w") as f:
        f.write("# BENCH — measured results\n\n")
        f.write(f"Build suite input: {N_TURNS} synthetic transcript turns in "
                f"{N_PARTS} partitions (identical at both levels); one pass "
                f"builds HLL(p=14) + Bloom + CMS(2^16x4) + KLL(400) and "
                f"tree-merges.\nQuery suite input: {SF_DIR}.\n\n")
        f.write("| parallelism | build sec (4 sketches, 1 pass) | turns/sec |\n")
        f.write("|---|---|---|\n")
        for cores in (lo_cores, CPUS):
            s = scaling[f"c{cores}"]
            f.write(f"| local[{cores}] | {s['build_sec']} | "
                    f"{s['turns_per_sec']} |\n")
        f.write(f"\n**Scaling efficiency (N -> 4N): {eff:.3f}** "
                f"(target >= 0.8, BASELINE.json north_rule)\n\n")
        f.write("| query | sec |\n|---|---|\n")
        for k, v in sorted(queries.items()):
            f.write(f"| {k} | {v} |\n")
        f.write(f"\nHeadline suite total: {total} sec\n")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
