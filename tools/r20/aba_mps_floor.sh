#!/bin/bash
# r20: does lowering the AQE coalescing floor below r19's 64k recover
# the CPU-dense compressed-small stages (q57/q83/q45 distinct/sketch
# passes run 3-wide at 64k because 450k-pair distinct outputs compress
# to ~200KB)? Full-bench bracket 64/16/8/64, same era.
set -e
cd /root/repo
run() {
  echo "=== $1 MIN_PARTITION_KB=$2 $(date +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_AQE_MIN_PARTITION_KB=$2 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/tools/r20/aba_mps_$1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E '"metric"' || true
}
run k64a 64
run k16 16
run k8 8
run k64b 64
