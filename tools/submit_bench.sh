#!/usr/bin/env bash
# Ship the library to a cluster the way the north_star prescribes:
#   spark-submit --py-files dist/sparksketch.zip bench.py
# In the sandbox this runs against local[N]; on a real cluster point
# --master at YARN/K8s and the same zip + bench.py work unchanged.
set -euo pipefail
cd "$(dirname "$0")/.."

mkdir -p dist
rm -f dist/sparksketch.zip
(cd . && zip -qr dist/sparksketch.zip sparksketch -x '*__pycache__*')

exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --py-files dist/sparksketch.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=131072 \
  bench.py
