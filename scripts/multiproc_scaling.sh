#!/bin/bash
# Multi-process weak-scaling evidence (BASELINE.md "cluster-analog"):
# 4 simultaneous local[4] JVMs each replaying a 16M-event conv-hash shard
# vs 1 local[4] JVM on one shard. Build first: sbt -batch package
set -e
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/flexrmlspark_2.13-0.1.0.jar
COMMON="--driver-memory 12g --jars $JAR --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=4 \
  --conf spark.sql.adaptive.coalescePartitions.enabled=false"

if [ ! -d target/shardrun2/shard3 ]; then
  /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 32g --jars $JAR \
    --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=16 \
    -I scripts/multiproc_prep.scala
fi

# SHARD_MODE=stream (exported by the caller) routes each shard through the
# Structured Streaming entry point instead of batch replay
run_one() {
  SHARD_LOG=$1 SHARD_MODE=${SHARD_MODE:-batch} /opt/spark/bin/spark-shell --master 'local[4]' $COMMON \
    -I scripts/multiproc_replay.scala 2>&1 | grep -a SHARD_RESULT
}
echo "== baseline: 1 process x 4 cores, one 16M shard"
run_one target/shardrun2/shard0
echo "== weak-scaled: 4 processes x 4 cores, one 16M shard each (simultaneous)"
for p in 0 1 2 3; do run_one target/shardrun2/shard$p & done
wait
