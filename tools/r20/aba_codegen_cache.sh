#!/bin/bash
# r20: same-era A-B-A adjudication of spark.sql.codegen.cache.maxEntries
# (inherited uncommitted change from the interrupted session start — its
# comment cited numbers with no artifact, so the knob is RE-measured here
# from scratch before being kept).
# A = 100 entries (Spark default), B = 4096 (the proposed knob).
# Order A,B,B,A so each config sees both halves of any era drift.
set -e
cd /root/repo
mkdir -p tools/r20
run() {
  local tag="$1"; local entries="$2"
  echo "=== run $tag entries=$entries $(date +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_CODEGEN_CACHE_ENTRIES=$entries \
  SPARK_GRAFT_BENCH_OUT=/root/repo/tools/r20/aba_cg_${tag}.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E '"metric"|codegen compile wall' || true
}
run a1 100
run b1 4096
run b2 4096
run a2 100
echo "=== done $(date +%H:%M:%S) ==="
