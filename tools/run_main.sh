#!/bin/bash
# Run a graft main directly with java (no sbt lock), mirroring
# build.sbt's fork JVM options. Usage:
#   tools/run_main.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), plus whatever the main reads
# (SPARK_GRAFT_ONLY, SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR, ...).
# Compile first: sbt -batch compile (classes land in target/scala-2.13).
set -euo pipefail
cd "$(dirname "$0")/.."
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADDOPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
