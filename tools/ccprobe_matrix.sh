#!/bin/bash
# CC probe matrix: one JVM per (edges, shape, config) — see CCProbe.scala.
# Usage: tools/ccprobe_matrix.sh <logfile> "<edges>:<shape>:<config>" ...
LOG="$1"; shift
cd /root/repo
for spec in "$@"; do
  IFS=':' read -r edges shape config <<< "$spec"
  echo "=== $(date +%H:%M:%S) $edges $shape $config ===" >> "$LOG"
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-96g}" GRAFT_CC_DEBUG=1 \
    sbt -batch "runMain graft.tools.CCProbe $edges $shape $config" 2>/dev/null \
    | grep -E "^\[info\] \[cc" | sed 's/^\[info\] //' >> "$LOG"
done
echo "=== $(date +%H:%M:%S) matrix done ===" >> "$LOG"
