"""Worker-process environment tuning for PySpark sessions.

Two independent, measured fixes (round-5 profiling; see
worker_site/sitecustomize.py and BENCH.md for the numbers):

1. zipimport cache fix — CPython 3.11's ``zipimporter.invalidate_caches``
   re-reads whole zip directories on every call and pyspark calls it once
   per task: ~137 ms/task of pure overhead.  Shipped to workers as a
   ``sitecustomize`` on PYTHONPATH (the daemon inherits the driver
   process's environment in local mode, and PythonWorkerFactory appends
   the inherited PYTHONPATH to the workers' own).

2. glibc malloc tuning — the vectorized sketch kernels allocate MB-scale
   numpy temporaries per Arrow batch; with the default
   MALLOC_MMAP_THRESHOLD_ those come from fresh mmaps whose teardown
   triggers cross-core TLB shootdowns, serializing otherwise
   embarrassingly-parallel workers.  Raising the threshold keeps the
   temporaries on the (reused) heap.  Measured: local[4] one-pass
   4-sketch build 2.4 s -> 2.1 s and N->4N scaling efficiency +0.05.

``configure()`` must run BEFORE the first SparkSession is created in the
process (the JVM snapshots the environment at launch).  It is a no-op on
re-invocation and safe when the JVM already exists (workers simply keep
the previous environment).
"""
from __future__ import annotations

import os

_SITE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "worker_site")


def configure(env: dict | None = None) -> dict:
    """Install worker-env tuning into ``env`` (default: os.environ).

    Returns the mapping for convenience, so callers building a subprocess
    environment can do ``workerenv.configure(dict(os.environ))``.
    """
    e = os.environ if env is None else env
    pp = e.get("PYTHONPATH", "")
    if _SITE_DIR not in pp.split(os.pathsep):
        e["PYTHONPATH"] = (pp + os.pathsep + _SITE_DIR) if pp else _SITE_DIR
    e.setdefault("SPARKSKETCH_ZIPIMPORT_FIX", "1")
    # keep numpy batch temporaries on the reused heap (no mmap/munmap +
    # TLB-shootdown churn); trim kept high so freed batches are reused
    e.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    e.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    return e
