"""Benchmark harness: sketch build+merge throughput (turns/sec) and headline
query latencies, at two parallelism levels (local[N] and local[4N] as the
sandbox stand-in for N vs 4N executors, per BASELINE.md §C).

Prints ONE JSON line:
  {"metric": ..., "value": <headline suite seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "throughput": {...}, "scaling": {...}}

and records the human-readable table in BENCH.md.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TURNS (default 2_000_000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("SPARK_GRAFT_TURNS", "2000000"))


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
            .getOrCreate())


def _build_suite(spark, cores: int, n_turns: int) -> dict:
    """The north-rule workload: build per-partition sketches over the
    transcripts table and tree-merge.  Returns per-sketch seconds."""
    from pyspark import StorageLevel
    from sparksketch.agg import (BloomSpec, CMSSpec, HLLSpec, KLLSpec,
                                 sketch_dataframe)
    from sparksketch.shape import Shape
    from sparksketch.transcripts import synthesize_transcripts

    tr = synthesize_transcripts(spark, n_turns, partitions=cores) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    tr.count()  # materialize generation outside the timed region

    out = {}
    t0 = time.monotonic()
    sk = sketch_dataframe(tr, HLLSpec(p=14), ["conv_id"])
    out["hll_build"] = time.monotonic() - t0
    out["_hll_estimate"] = sk.estimate()

    t0 = time.monotonic()
    sk = sketch_dataframe(tr, BloomSpec(Shape.from_np(4 * n_turns, 1e-6)),
                          ["conv_id", "tool"])
    out["bloom_build"] = time.monotonic() - t0

    t0 = time.monotonic()
    sketch_dataframe(tr, CMSSpec(w=1 << 16, d=4), ["tool"])
    out["cms_build"] = time.monotonic() - t0

    t0 = time.monotonic()
    sketch_dataframe(tr, KLLSpec(k=400, col="turn_idx"), ["conv_id"],
                     canonical=True)
    out["kll_build"] = time.monotonic() - t0

    out["_build_total"] = sum(v for k, v in out.items()
                              if not k.startswith("_"))
    out["_turns_per_sec"] = 4 * n_turns / out["_build_total"]
    tr.unpersist()
    return out


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

    # --- scaling: same input at N and 4N cores ----------------------------
    lo_cores = max(CPUS // 4, 1)
    scaling = {}
    for cores in (lo_cores, CPUS):
        spark = _session(cores)
        spark.sparkContext.setLogLevel("ERROR")
        suite = _build_suite(spark, cores, N_TURNS)
        scaling[f"c{cores}"] = {
            "build_sec": round(suite["_build_total"], 3),
            "turns_per_sec": round(suite["_turns_per_sec"]),
            "per_sketch": {k: round(v, 3) for k, v in suite.items()
                           if not k.startswith("_")},
        }
        if cores == CPUS:
            queries = _headline_queries(spark, SF_DIR)
        spark.stop()
    thr_lo = scaling[f"c{lo_cores}"]["turns_per_sec"]
    thr_hi = scaling[f"c{CPUS}"]["turns_per_sec"]
    eff = thr_hi / ((CPUS / lo_cores) * thr_lo)
    scaling["efficiency"] = round(eff, 3)
    scaling["n_turns"] = N_TURNS

    total = round(sum(queries.values()), 3)
    results.update({
        "metric": "headline sketch-query suite wall time (sf dir) + "
                  "build/merge throughput at two parallelism levels",
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
        f.write(f"Input: {N_TURNS} synthetic transcript turns (build suite); "
                f"{SF_DIR} (query suite).\n\n")
        f.write("| parallelism | build sec (4 sketches) | turns/sec |\n")
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
