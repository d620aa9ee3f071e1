#!/bin/bash
# Repeat the multi-process weak-scaling measurement in DEEP-calm windows
# (1-min loadavg < 1.0): the 4x-simultaneous phase needs all 16 physical
# cores, so ambient co-tenant load biases it far more than the solo
# baseline. Appends SHARD_RESULT lines to target/multiproc_runs.log.
# Usage: scripts/multiproc_campaign.sh [runs=3]
set -u
RUNS=${1:-3}
cd "$(dirname "$0")/.."
for i in $(seq 1 "$RUNS"); do
  while :; do
    L=$(awk '{print $1}' /proc/loadavg)
    ok=$(awk -v l="$L" 'BEGIN{print (l<1.0)?1:0}')
    [ "$ok" = "1" ] && break
    sleep 30
  done
  echo "[mp-campaign] run $i starting, load=$(cat /proc/loadavg)" >> target/multiproc_runs.log
  bash scripts/multiproc_scaling.sh 2>&1 | grep -ao "SHARD_RESULT[^[]*\|SHARD_FAILED[^[]*\|== [a-z-]*:.*" >> target/multiproc_runs.log
done
echo "[mp-campaign] done" >> target/multiproc_runs.log
