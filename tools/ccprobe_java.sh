#!/bin/bash
# CC probe matrix runner that bypasses sbt (no project-lock contention
# with interactive builds): plain java over target/scala-2.13/classes +
# /opt/spark/jars, same --add-opens set as build.sbt's forked runs.
# Usage: tools/ccprobe_java.sh <logfile> "<edges>:<shape>:<config>" ...
# Env: SPARK_DRIVER_MEM (default 64g), SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE,
#      GRAFT_CC_CLASSES (classes dir; snapshot target/scala-2.13/classes to a
#      frozen copy first if the matrix runs while development recompiles —
#      cells launch fresh JVMs and must all see ONE code version)
LOG="$1"; shift
cd /root/repo
CLASSES="${GRAFT_CC_CLASSES:-target/scala-2.13/classes}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for spec in "$@"; do
  IFS=':' read -r edges shape config <<< "$spec"
  echo "=== $(date +%H:%M:%S) $edges $shape $config ===" >> "$LOG"
  GRAFT_CC_DEBUG=1 java $ADD_OPENS \
    -Xmx"${SPARK_DRIVER_MEM:-64g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" \
    graft.tools.CCProbe "$edges" "$shape" "$config" 2>>"$LOG.err" \
    | grep -E "^\[cc" >> "$LOG"
  # a crashed cell must be visible in the main log, not silence
  [ "${PIPESTATUS[0]}" -eq 0 ] || echo "!!! $edges $shape $config EXIT ${PIPESTATUS[0]} (see $LOG.err)" >> "$LOG"
done
echo "=== $(date +%H:%M:%S) matrix done ===" >> "$LOG"
