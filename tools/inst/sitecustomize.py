"""Worker-side instrumentation for the per-task Python-runner latency hunt
(round 5).  Activated only when SPARKSKETCH_INST_DIR is set; loaded into
every python process via PYTHONPATH, but patches only processes that import
pyspark.worker (i.e. daemon-forked workers).

Logs one JSON line per patched call to $SPARKSKETCH_INST_DIR/<pid>.jsonl
with a monotonic-ish wall timestamp, so the gap between a task's sections
can be attributed: which read in the worker preamble blocks on the JVM.
"""
import json
import os
import sys
import time

_DIR = os.environ.get("SPARKSKETCH_INST_DIR")

if os.environ.get("SPARKSKETCH_ZIPIMPORT_FIX"):
    # Backport CPython>=3.12's mtime guard to zipimporter.invalidate_caches
    # (python/cpython#87319): on 3.11 it unconditionally re-reads the whole
    # zip central directory, and pyspark's worker calls
    # importlib.invalidate_caches() once per task -> ~137 ms/task pure
    # overhead with pyspark.zip + py4j.zip + spark-core.jar on sys.path.
    import zipimport

    _orig_invalidate = zipimport.zipimporter.invalidate_caches

    def _invalidate_if_changed(self):
        try:
            mtime = os.path.getmtime(self.archive)
        except OSError:
            mtime = None
        cached = getattr(self, "_sparksketch_zip_mtime", ())
        if cached == (mtime,) and mtime is not None:
            return
        self._sparksketch_zip_mtime = (mtime,)
        return _orig_invalidate(self)

    zipimport.zipimporter.invalidate_caches = _invalidate_if_changed

if _DIR:
    import importlib.abc
    import importlib.machinery

    def _log(event, dt):
        try:
            with open(os.path.join(_DIR, f"{os.getpid()}.jsonl"), "a") as f:
                f.write(json.dumps({"t": time.time(), "pid": os.getpid(),
                                    "ev": event, "dt": round(dt, 6)}) + "\n")
        except OSError:
            pass

    def _wrap(mod, name):
        orig = getattr(mod, name, None)
        if orig is None:
            return

        def wrapped(*a, **k):
            t0 = time.time()
            try:
                return orig(*a, **k)
            finally:
                _log(name, time.time() - t0)
        setattr(mod, name, wrapped)

    def _fine_setup_spark_files(wu):
        """Re-time setup_spark_files piecewise: blocking reads vs local CPU
        (add_path / importlib.invalidate_caches)."""
        import importlib
        read_int = wu.read_int
        utf8_deserializer = wu.utf8_deserializer

        def fine(infile):
            t0 = time.time()
            spark_files_dir = utf8_deserializer.loads(infile)
            t1 = time.time()
            if not wu.is_remote_only():
                from pyspark.core.files import SparkFiles
                SparkFiles._root_directory = spark_files_dir
                SparkFiles._is_running_on_worker = True
            wu.add_path(spark_files_dir)
            num = read_int(infile)
            for _ in range(num):
                filename = utf8_deserializer.loads(infile)
                wu.add_path(os.path.join(spark_files_dir, filename))
            t2 = time.time()
            importlib.invalidate_caches()
            t3 = time.time()
            _log("sf_read_dir", t1 - t0)
            _log("sf_includes", t2 - t1)
            _log("sf_invalidate", t3 - t2)
            _log("sf_syspath_len", len(sys.path))
        return fine

    def _patch_worker(worker):
        wu = sys.modules.get("pyspark.worker_util")
        if wu is not None:
            fine = _fine_setup_spark_files(wu)
            wu.setup_spark_files = fine
            if hasattr(worker, "setup_spark_files"):
                worker.setup_spark_files = fine
            for fname in ("check_python_version",
                          "setup_broadcasts", "setup_memory_limits",
                          "send_accumulator_updates"):
                _wrap(wu, fname)
                # worker.py imported these names into its own namespace
                if hasattr(worker, fname):
                    _wrap(worker, fname)
        for fname in ("read_udfs", "read_command"):
            _wrap(worker, fname)
        _wrap(worker, "main")

    class _Hook(importlib.abc.MetaPathFinder, importlib.abc.Loader):
        def find_spec(self, fullname, path, target=None):
            if fullname != "pyspark.worker":
                return None
            # defer to the normal finder, then patch post-exec
            for finder in sys.meta_path:
                if finder is self:
                    continue
                spec = finder.find_spec(fullname, path, target)
                if spec is not None:
                    orig_exec = spec.loader.exec_module

                    class L(importlib.abc.Loader):
                        def create_module(self, s):
                            return None

                        def exec_module(self, module):
                            orig_exec(module)
                            _patch_worker(module)
                    spec.loader = L()
                    return spec
            return None

    sys.meta_path.insert(0, _Hook())
