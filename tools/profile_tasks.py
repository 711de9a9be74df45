"""Per-task decomposition of the bench build at one parallelism level.

Runs the same workload as bench._child_build with Spark event logging
enabled, then parses the event log for the timed pass: per-task duration,
executorRunTime, jvmGcTime, result serialization, scheduler delay, and the
wave structure (launch/finish timeline).  Prints one JSON line.

Usage: python tools/profile_tasks.py <cores>
"""
import glob
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _parse(fp: str, jobs: dict, tasks: list) -> None:
    with open(fp) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = ev.get("Stage IDs", [])
            elif k == "SparkListenerTaskEnd":
                ti = ev["Task Info"]
                tm = ev.get("Task Metrics") or {}
                tasks.append({
                    "stage": ev["Stage ID"],
                    "launch": ti["Launch Time"],
                    "finish": ti["Finish Time"],
                    "dur_ms": ti["Finish Time"] - ti["Launch Time"],
                    "run_ms": tm.get("Executor Run Time", 0),
                    "cpu_ms": round((tm.get("Executor CPU Time") or 0)
                                    / 1e6, 1),
                    "gc_ms": tm.get("JVM GC Time", 0),
                    "deser_ms": tm.get("Executor Deserialize Time", 0),
                    "result_ser_ms": tm.get("Result Serialization Time", 0),
                    "result_bytes": ti.get("Result Size",
                                           tm.get("Result Size", 0)),
                })


def main() -> None:
    cores = int(sys.argv[1])
    import bench
    from pyspark import StorageLevel
    from pyspark.sql import SparkSession
    from sparksketch.agg import build_partials_multi, tree_aggregate_multi
    from sparksketch.transcripts import synthesize_transcripts

    evdir = tempfile.mkdtemp(prefix="sparkev_")
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName(f"profile-tasks-{cores}")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.default.parallelism", str(cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     str(bench.BUILD_ARROW_BATCH))
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.dir", evdir)
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    tr = synthesize_transcripts(spark, bench.N_TURNS,
                                partitions=bench.N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = bench._build_specs(bench.N_TURNS)
    names = list(specs)
    plan = build_partials_multi(tr, specs)
    tree_aggregate_multi(plan, names, est_parts=bench.N_PARTS)  # warm
    w0 = time.time() * 1000
    t0 = time.monotonic()
    tree_aggregate_multi(plan, names, est_parts=bench.N_PARTS)
    wall = time.monotonic() - t0
    w1 = time.time() * 1000
    spark.stop()

    # parse the event log: take the LAST job's tasks (the timed pass)
    path = sorted(glob.glob(os.path.join(evdir, "*")))[-1]
    if os.path.isdir(path):  # Spark 4 rolling event-log dir
        files = sorted(p for p in glob.glob(os.path.join(path, "*"))
                       if os.path.isfile(p) and "appstatus" not in p)
    else:
        files = [path]
    jobs = {}
    tasks = []
    for fp in files:
        _parse(fp, jobs, tasks)
    # map every job onto the timed window [w0, w1]
    window_jobs = []
    for jid, sids in sorted(jobs.items()):
        jt = [t for t in tasks if t["stage"] in set(sids)]
        if not jt:
            continue
        j0 = min(t["launch"] for t in jt)
        j1 = max(t["finish"] for t in jt)
        if j1 >= w0 and j0 <= w1:
            window_jobs.append({
                "job": jid, "n_tasks": len(jt),
                "start_off_ms": round(j0 - w0),
                "end_off_ms": round(j1 - w0),
                "sum_dur_ms": sum(t["dur_ms"] for t in jt),
            })
    last_job = max(jobs)
    stage_ids = set(jobs[last_job])
    tt = [t for t in tasks if t["stage"] in stage_ids]
    tt.sort(key=lambda t: t["launch"])
    t_first = min(t["launch"] for t in tt)
    t_last = max(t["finish"] for t in tt)
    durs = sorted(t["dur_ms"] for t in tt)
    out = {
        "cores": cores,
        "wall_s": round(wall, 3),
        "window_ms": round(w1 - w0),
        "window_jobs": window_jobs,
        "n_tasks": len(tt),
        "span_ms": t_last - t_first,
        "sum_dur_ms": sum(durs),
        "sum_run_ms": sum(t["run_ms"] for t in tt),
        "sum_cpu_ms": sum(t["cpu_ms"] for t in tt),
        "sum_gc_ms": sum(t["gc_ms"] for t in tt),
        "sum_deser_ms": sum(t["deser_ms"] for t in tt),
        "sum_result_ser_ms": sum(t["result_ser_ms"] for t in tt),
        "task_dur_ms": {"min": durs[0], "p50": durs[len(durs) // 2],
                        "p90": durs[int(len(durs) * 0.9)], "max": durs[-1]},
        # occupancy: sum of task durations / (span * cores) — how full the
        # slots were while the job ran
        "occupancy": round(sum(durs) / ((t_last - t_first) * cores), 3),
        # timeline of (launch, finish) offsets for wave inspection
        "timeline": [[t["launch"] - t_first, t["finish"] - t_first]
                     for t in tt],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
