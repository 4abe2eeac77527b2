#!/bin/bash
# Plain-java runner for graft mains (keeps sbt free). Usage:
#   tools/run_graft.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), plus whatever the main reads.
SCALA_LIB=$(find /root/.cache/coursier -name "scala-library-2.13*.jar" | head -1)
CP="/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes:$SCALA_LIB:/opt/spark/jars/*"
# scalatest etc for drive classes living in test scope:
for j in $(find /root/.cache/coursier -name "scalatest*.jar" -o -name "scalactic*.jar" 2>/dev/null); do CP="$CP:$j"; done
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$@"
