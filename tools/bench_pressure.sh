#!/usr/bin/env bash
# Memory-pressure rehearsal (r13 judge directive #1): run the
# BENCH_SCALE rows at N× (default 8×) under small REAL executor heaps
# and record spill metrics + exact-equality vs the roomy control run.
#
#   tools/bench_pressure.sh [mult] [row ...]
#
# Same environment contract as tools/verify_cluster.sh: a /tmp
# SPARK_HOME shim (so executor work dirs stay out of /opt/spark) and
# SPARK_SCALA_VERSION for the worker command builder. Override the
# tight master with SPARK_GRAFT_PRESSURE_MASTER (default
# local-cluster[2,2,1024]: 2 workers × 2 cores × 1 GiB executor heap —
# well under the reference's 3 GB executors).
set -euo pipefail
cd "$(dirname "$0")/.."
SHIM=/tmp/spark-home-shim
mkdir -p "$SHIM"
for f in jars conf RELEASE; do ln -sfn "/opt/spark/$f" "$SHIM/$f"; done
SPARK_HOME="$SHIM" SPARK_SCALA_VERSION=2.13 \
  tools/run_main.sh graft.BenchPressure "$@"
