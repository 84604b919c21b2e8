#!/bin/bash
# Direct-JVM bench probe (bypasses sbt): controlled heap/GC flags for
# A/B isolation of host-config pathologies (round-21 item 1).
#   usage: HEAP=89g CPUS=32 ONLY=mm_source,... RUNS=3 GCLOG=/tmp/gc.log \
#          tools/benchprobe.sh [extra JVM flags...]
set -u
cd "$(dirname "$0")/.."
HEAP="${HEAP:-8g}"
CPUS="${CPUS:-32}"
RUNS="${RUNS:-3}"
SF="${SF:-/root/testdata/sf0.1}"
GCFLAG=""
[ -n "${GCLOG:-}" ] && GCFLAG="-Xlog:gc*:file=$GCLOG:time,uptime,level,tags"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
       SPARK_GRAFT_BENCH_RUNS="$RUNS"
# an empty ONLY must mean "no filter", not "empty filter"
[ -n "${ONLY:-}" ] && export SPARK_GRAFT_BENCH_ONLY="$ONLY"
exec java -Xmx"$HEAP" $GCFLAG $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "$@" \
  -cp target/scala-2.13/classes:"/opt/spark/jars/*" graft.Bench
