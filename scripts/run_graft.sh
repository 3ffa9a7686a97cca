#!/bin/bash
# Dev-only standalone launcher: run a graft main class directly from the
# sbt-compiled classes without taking the sbt project lock (so sweeps can
# run while `sbt test` owns the build). Mirrors build.sbt's forked-JVM
# flags exactly: the JDK-17 --add-opens set Spark 4 needs outside
# spark-submit, UTC session TZ, UI off, SPARK_DRIVER_MEM heap override.
#
# Usage: scripts/run_graft.sh <mainClass> [args...]
#   e.g. scripts/run_graft.sh graft.Verify /root/testdata/sf0.01 /tmp/out
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" \
  "$MAIN" "$@"
