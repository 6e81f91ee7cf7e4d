#!/bin/bash
# Run a graft main class from the compiled classes dir WITHOUT sbt — so
# long-running measurement jobs (ScaleData generation, the SCALE.md sf1
# bench passes) can run in the background while sbt keeps compiling and
# testing in the foreground. Snapshots the classes dir first: a
# concurrent `sbt compile` rewriting classfiles under a running JVM's
# lazy classloading would be a race.
# Usage: tools/run_main.sh <MainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
SNAP=$(mktemp -d /tmp/graft-classes-XXXX)
cp -r target/scala-2.13/classes/. "$SNAP/"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# SPARK_GRAFT_JAVA_OPTS: extra -D/-X flags (e.g. relaxed
# spark.network.timeout for >= factor-1000 graph shuffles, where a long
# driver GC pause can trip the local heartbeat and stop the context)
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  ${SPARK_GRAFT_JAVA_OPTS:-} \
  -cp "$SNAP:/opt/spark/jars/*" "$MAIN" "$@"
