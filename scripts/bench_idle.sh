#!/bin/bash
# Load-gated bench runner: the bench contract (BASELINE.md) keys on
# judge-idle totals, and this host's ambient contention inflates totals
# 1.5-3x. Wait for the 1-minute load average to drop below the gate
# before launching; give up after N attempts and run anyway (the JSON
# carries load_avg either way, so a contended run self-documents).
#
# Usage: scripts/bench_idle.sh [sfDir] [gate] [attempts] [sleepSec]
set -uo pipefail
sf=${1:-/root/testdata/sf0.1}
gate=${2:-1.0}
attempts=${3:-20}
sleepsec=${4:-60}
# compile BEFORE the load gate: with sources unchanged, the gated
# window is then spent on the measured run, not on sbt's compile spike
# (which otherwise rides into the JVM's pre-run load_avg stamp)
sbt -batch compile >/dev/null 2>&1 || exit 1
for i in $(seq 1 "$attempts"); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(awk -v l="$load" -v g="$gate" 'BEGIN{print (l<g)?1:0}')
  if [ "$ok" = 1 ]; then break; fi
  echo "[bench_idle] attempt $i/$attempts: load $load >= $gate, sleeping ${sleepsec}s" >&2
  sleep "$sleepsec"
done
SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E '^\{"metric"'
