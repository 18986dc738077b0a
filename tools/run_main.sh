#!/usr/bin/env bash
# Run a graft main directly on the compiled classes (no sbt lock, no
# sbt startup in timing-sensitive benches):
#
#   tools/run_main.sh graft.Bench [args...]
#
# Requires a prior `sbt compile`. Mirrors build.sbt's jdk17 --add-opens
# list; add the verify_cluster.sh SPARK_HOME/SPARK_SCALA_VERSION env
# yourself when the main uses a local-cluster master.
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN=$1; shift
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio
  java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPENS=()
for p in "${ADD_OPENS[@]}"; do OPENS+=("--add-opens=$p=ALL-UNNAMED"); done
# absolute classpath: local-cluster executors launch in their own work
# dirs and inherit this via java.class.path -> spark.executor.extraClassPath
exec java "${OPENS[@]}" -Xmx16g -Dspark.ui.enabled=false \
  -cp "$(pwd)/target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
