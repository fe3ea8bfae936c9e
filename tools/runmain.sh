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
# Local-mode heartbeat tolerance for every tool JVM (probes, ScaleUp,
# long sweeps): a missed heartbeat in one shared driver/executor JVM
# only ever means a starved RPC thread — on a host with hypervisor
# steal the default 60x10s kill-switch System.exit'd a sweep 2h in.
# A session builder that sets these itself (Bench) wins: SparkConf
# reads system properties first, then .config() overrides.
exec java -Xmx"$MEM" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.executor.heartbeatInterval=60s \
  -Dspark.executor.heartbeat.maxFailures=240 \
  -Dspark.network.timeout=600s \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
