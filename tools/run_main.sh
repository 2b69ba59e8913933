#!/bin/bash
# Plain-java launcher for graft mains — same classpath/flags sbt's `run`
# uses (build.sbt jdk17AddOpens + driver mem env), without sbt's project
# lock, so long measurement jobs (Verify/Bench/QueryProbe at big sf) can
# run in the background while sbt compiles/tests in the foreground.
# Usage: [SPARK_DRIVER_MEM=48g] tools/run_main.sh graft.Verify <args...>
cd "$(dirname "$0")/.." || exit 1
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dderby.stream.error.file=/tmp/derby.log \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  "$@"
