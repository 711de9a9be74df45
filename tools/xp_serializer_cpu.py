"""CPU-seconds attribution of the Arrow crossing's non-scaling term.

Round-5 diagnostic chain (each step reproducible here or in the sibling
xp_* tools), all pinned exactly like bench.py's children:

1. tools/xp_decomp.py — the pure-JVM scan+hash scales 0.90 (1 -> 4
   pinned CPUs) while the identity mapInPandas crossing scales ~0.45;
   the full build rides the crossing.
2. This script, mode `cputime` — during the crossing the process tree's
   WALL at the hi level is ~97%% CPU-busy, yet it burns ~2.2x the
   CPU-SECONDS of the lo level for identical work (measured: JVM task
   threads 7.9 -> 19.7 CPU-s; python workers flat at ~1.8; stime and
   page faults negligible at both levels).  The crossing does not stall
   — its work INFLATES under concurrency.
3. This script, mode `threads` — the inflation is entirely in the
   "Executor task launch worker" threads (GC threads ~0.1 CPU-s,
   compiler ~0.6): it is the row-wise Arrow serializer path itself.
4. This script, mode `bw` — the same pinned CPUs scale pure memcpy
   LINEARLY to 4 procs (8.2 -> 35.7 GB/s aggregate) and the no-Spark
   NumPy calibration scales 0.90, so neither CPU count nor memory
   BANDWIDTH is the limit.
5. Ruled out by direct A/B (same-window, interleaved): GC choice
   (ParallelGC identical), arrow/jemalloc/mimalloc/system allocator
   pools, arrow batch size 16K vs 128K, 16 vs 64 partitions, TCP vs
   Unix-domain worker sockets, nullable vs non-null value column,
   int32 vs double value width, wider (8-CPU) cpuset for the same
   local[4] job (4.47 s vs 4.75 s — marginal).
6. The one knob that moved it: spark.buffer.size 64 KiB -> 1 MiB
   (tools/xp_hiknobs.py, -13%% at the hi level) — now set in
   bench._session.

Conclusion: the residual is micro-architectural — the serializer's
per-value, latency-bound load/store pattern (UnsafeRow field reads ->
ArrowVector writes -> buffered socket) loses IPC when four copies share
this VM's memory subsystem, in a way prefetchable streaming (memcpy,
scan) and cache-resident compute (NumPy calibration) do not.  Real
N -> 4N EXECUTORS each bring their own socket/LLC; this one-box
stand-in shares one.

Usage: python tools/xp_serializer_cpu.py [cputime|threads|bw]
Env: XP_TURNS (default 16M), XP_LEVELS (default "1,4").
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from collections import defaultdict

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_TURNS = int(os.environ.get("XP_TURNS", "16000000"))
LEVELS = [int(x) for x in os.environ.get("XP_LEVELS", "1,4").split(",")]


# -- process-tree and per-thread /proc accounting ---------------------------

def _tree_cpu(root_pid: int) -> dict:
    """{kind: [utime_jiffies, stime_jiffies, minflt]} over the process
    tree rooted at root_pid (kind = jvm / python / other by comm)."""
    agg: dict = {}
    pids, seen = [root_pid], set()
    while pids:
        p = pids.pop()
        if p in seen:
            continue
        seen.add(p)
        try:
            with open(f"/proc/{p}/stat") as f:
                raw = f.read()
            comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
            parts = raw.rsplit(")", 1)[1].split()
            kind = ("jvm" if comm == "java"
                    else "python" if "python" in comm else comm)
            a = agg.setdefault(kind, [0, 0, 0])
            a[0] += int(parts[11]); a[1] += int(parts[12])
            a[2] += int(parts[7])
            kids = subprocess.run(
                ["ps", "-o", "pid=", "--ppid", str(p)],
                capture_output=True, text=True).stdout.split()
            pids.extend(int(k) for k in kids)
        except Exception:
            pass
    return agg


def _jvm_threads(jpid: int) -> dict:
    d = {}
    base = f"/proc/{jpid}/task"
    for tid in os.listdir(base):
        try:
            with open(f"{base}/{tid}/stat") as f:
                raw = f.read()
            comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
            parts = raw.rsplit(")", 1)[1].split()
            d[tid] = (comm, int(parts[11]) + int(parts[12]))
        except Exception:
            pass
    return d


def _jvm_pid(me: int) -> int | None:
    out = subprocess.run(["ps", "-o", "pid=,comm=", "--ppid", str(me)],
                         capture_output=True, text=True).stdout
    for line in out.splitlines():
        pid, comm = line.split(None, 1)
        if comm.strip() == "java":
            return int(pid)
    return None


# -- the measured workload: the bench build's identity crossing -------------

def _crossing(spark):
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from bench import N_PARTS, _build_specs
    from sparksketch.transcripts import synthesize_transcripts

    tr = synthesize_transcripts(spark, N_TURNS, partitions=N_PARTS) \
        .persist(StorageLevel.MEMORY_ONLY)
    tr.count()
    specs = _build_specs(N_TURNS)
    exprs, seen = [], set()
    for name, (spec, cols) in specs.items():
        for bc, key, c in spec.prepare_keyed_exprs(cols, prefix=f"{name}__"):
            if key not in seen:
                seen.add(key)
                exprs.append(c)
    prepared = tr.select(*exprs)

    def run():
        def fn(batches):
            m = 0
            for pdf in batches:
                m += len(pdf)
            yield pd.DataFrame({"rows": [m]})
        prepared.mapInPandas(fn, schema="rows long") \
            .agg(F.sum("rows")).collect()
    return run


def child(mode: str, cores: int) -> None:
    from bench import BUILD_ARROW_BATCH, _session
    spark = _session(cores, arrow_batch=BUILD_ARROW_BATCH)
    spark.sparkContext.setLogLevel("ERROR")
    run = _crossing(spark)
    run()  # warm
    hz = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    out = {"cores": cores, "mode": mode, "passes": []}
    if mode == "cputime":
        for _ in range(3):
            a = _tree_cpu(me)
            t0 = time.monotonic()
            run()
            wall = time.monotonic() - t0
            b = _tree_cpu(me)
            d = {}
            for k in b:
                ua, sa, fa = a.get(k, [0, 0, 0])
                ub, sb, fb = b[k]
                d[k] = {"u": round((ub - ua) / hz, 2),
                        "s": round((sb - sa) / hz, 2), "minflt": fb - fa}
            out["passes"].append({"wall": round(wall, 3), "by": d})
    else:  # threads
        jpid = _jvm_pid(me)
        a = _jvm_threads(jpid)
        t0 = time.monotonic()
        run()
        wall = time.monotonic() - t0
        b = _jvm_threads(jpid)
        agg = defaultdict(float)
        for tid, (comm, cpu) in b.items():
            prev = a.get(tid, (comm, 0))[1]
            key = "".join(ch for ch in comm if not ch.isdigit()).strip("-# ")
            agg[key] += (cpu - prev) / hz
        out["passes"].append({
            "wall": round(wall, 3),
            "threads": sorted(((k, round(v, 2)) for k, v in agg.items()
                               if v > 0.05), key=lambda kv: -kv[1])[:12]})
    spark.stop()
    print(json.dumps(out))


# -- hardware probe: aggregate memcpy scaling --------------------------------

def _bw_work(args):
    import numpy as np
    cpu, mb, reps = args
    os.sched_setaffinity(0, {cpu})
    a = np.frombuffer(np.random.bytes(mb << 20), dtype=np.uint8)
    dst = np.empty_like(a)
    t0 = time.monotonic()
    for _ in range(reps):
        np.copyto(dst, a)
        np.copyto(dst, a)
    return (2 * reps * mb) / (time.monotonic() - t0)


def bw_main() -> None:
    import multiprocessing as mp
    for n in (1, 2, 4, 8):
        with mp.Pool(n) as p:
            res = p.map(_bw_work, [(i, 256, 20) for i in range(n)])
        print(json.dumps({"procs": n, "agg_MBps": round(sum(res)),
                          "per_proc": [round(r) for r in res]}), flush=True)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "cputime"
    if mode == "bw":
        bw_main()
        return
    from bench import _pin_spec
    from sparksketch import workerenv
    env = workerenv.configure(dict(os.environ))
    for cores in LEVELS:
        cmd = ["/usr/bin/taskset", "-c", _pin_spec(cores), sys.executable,
               os.path.abspath(__file__), "--child", mode, str(cores)]
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=1800, cwd=HERE)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(lines[-1] if lines else f"FAIL: {out.stderr[-600:]}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]))
    else:
        main()
