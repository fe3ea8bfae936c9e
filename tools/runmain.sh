#!/bin/bash
# Run a compiled graft main directly (no sbt — usable while another
# sbt holds the project, e.g. a long bench sweep). Mirrors build.sbt's
# fork JVM options.
# Usage: tools/runmain.sh [-mMEM] graft.SomeMain args...
set -e
cd "$(dirname "$0")/.."
MEM="${SPARK_DRIVER_MEM:-8g}"
case "$1" in -m*) MEM="${1#-m}"; shift;; esac
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"$MEM" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
