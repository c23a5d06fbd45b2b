#!/bin/bash
# Run a graft main class directly on the compiled classes + Spark jars,
# skipping sbt JVM startup. Mirrors build.sbt's forked javaOptions
# (JDK17 add-opens, fixed pre-touched heap).
# Usage: tools/runmain.sh <MainClass> [args...]   (env passes through)
set -e
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
# Same defaults as build.sbt's forked javaOptions (ADVICE r2: an 8g default
# here against the 2e8-row bench guarantees the spill/GC distortion the
# protocol excludes — heap sizing must agree with the recorded protocol)
MEM="${SPARK_DRIVER_MEM:-48g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
XMS="${SPARK_DRIVER_XMS:-8g}"
# Private shuffle dir: something on this host garbage-collects /tmp while
# long jobs run (two multi-minute runs died on vanished temp_shuffle files).
# SPARK_LOCAL_DIRS outranks -Dspark.local.dir — export it so no inherited
# environment value can route shuffle files back into /tmp (BENCH_r02 rc=1).
mkdir -p /root/repo/target/sparktmp
export SPARK_LOCAL_DIRS=/root/repo/target/sparktmp
exec java -cp "$CP" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.extensions=graft.plans.GraftExtensions \
  -Dspark.local.dir=/root/repo/target/sparktmp \
  -Xmx"$MEM" -Xms"$XMS" -XX:+AlwaysPreTouch \
  "$@"
