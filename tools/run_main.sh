#!/bin/bash
# Run a graft main class directly against the compiled classes + the
# image's Spark jars, bypassing the sbt server (whose single command
# queue serializes long runMain jobs behind compiles). Mirrors
# build.sbt's forked-run JVM flags. Usage:
#   tools/run_main.sh graft.Bench
#   SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.TimeOne /root/testdata/sf0.1 q1
set -euo pipefail
cd "$(dirname "$0")/.."
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
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
