#!/usr/bin/env bash
# Run a graft main class directly (bypasses sbt so the sbt lock stays free).
# Usage: tools/run_graft.sh <mainClass> [args...]
# Mirrors build.sbt's forked-run JVM options (add-opens + driver heap).
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_GC: collector choice, defaulting to the throughput collector the
# r14 full-suite A/B selected (G1 111.4 s vs ParallelGC 79.4 s over 185
# queries — see build.sbt javaOptions for the full rationale).
# GRAFT_JAVA_OPTS: extra JVM flags for GC/heap experiments.
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  ${GRAFT_GC:--XX:+UseParallelGC} ${GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
