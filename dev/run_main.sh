#!/bin/bash
# Run a graft main class in a forked JVM outside sbt (same flags as
# build.sbt's run task). Usage:
#   SPARK_DRIVER_MEM=24g dev/run_main.sh graft.Bench [args...]
# Env passthrough: SPARK_GRAFT_SF_DIR, GRAFT_BENCH_* etc. are plain env
# vars and reach the JVM unchanged; GRAFT_JAVA_OPTS adds raw JVM flags.
# GRAFT_TEST_CP=1 adds the test classpath (probe mains live in test scope).
set -euo pipefail
MAIN="$1"; shift
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
if [ "${GRAFT_TEST_CP:-}" = "1" ]; then
  TJARS=$(find /root/.cache/coursier -name "scalatest*.jar" -o -name "scalactic*.jar" \
          -o -name "scalacheck*.jar" 2>/dev/null | tr '\n' ':')
  CP="/root/repo/target/scala-2.13/test-classes:$CP:$TJARS"
fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -XX:ReservedCodeCacheSize=1g \
  ${GRAFT_JAVA_OPTS:-} \
  -cp "$CP" "$MAIN" "$@"
