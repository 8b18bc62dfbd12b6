#!/bin/bash
# Time-boxed r16 endgame: the 2048x decade (the round's #1 deliverable
# — r15 claimed it and never measured it), split into three bench
# steps so one engine's death cannot take the others' numbers (the
# r15 single-pass campaign died mid-run and lost everything), then a
# fresh sf0.1 full sweep so the scaling ratios divide same-era,
# same-HEAD columns. Single pass at 2048x (SPARK_GRAFT_BENCH_PASSES=1,
# declared in the artifact) — the decade brackets matter more than
# the min-of-2 noise floor under the round's deadline.
set -u
R16=/tmp/r16
REPO=/root/repo
TD=/root/testdata/sf0.1
LOG=$R16/logs
mkdir -p "$LOG"

step() {
  local name=$1; shift
  echo "[final] $(date +%H:%M:%S) START $name"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[final] $(date +%H:%M:%S) FAILED $name rc=$rc — tail:"
    tail -5 "$LOG/$name.log" | cut -c1-200
  else
    echo "[final] $(date +%H:%M:%S) done  $name"
  fi
  rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
  df -h / | tail -1 | awk '{print "[final] disk: used "$3" avail "$4}'
  return $rc
}

# disk headroom for the 35 GB corpus + q32's spill
rm -rf "$REPO/target/sf1-derived" "$REPO/target/sf256-derived" "$REPO/target/sf512-derived"

# pair engines read documents+embeddings only — lineitem alone is
# 22 GB at 2048x and none of the five queries touches it
SPARK_GRAFT_SCALE_REPLICAS=2048 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  step gen_2048 sbt -batch "runMain graft.ScaleUp $TD $REPO/target/sf2048-derived" || exit 1
python3 "$REPO/tools/snapshot_rows.py" sf2048_derived "$REPO/target/sf2048-derived" "$R16/corpus_rows.json"

benchpart() { # benchpart <suffix> <queries>
  env SPARK_GRAFT_SF_DIR=$REPO/target/sf2048-derived SPARK_GRAFT_OBSERVE=1 SPARK_GRAFT_BENCH_PASSES=1 \
    SPARK_GRAFT_BENCH_ONLY=$2 SPARK_GRAFT_BENCH_OUT=$R16/bench_2048x_$1.json \
    step "bench_2048x_$1" sbt -batch "runMain graft.Bench"
}
benchpart a q34_dedup_embedding,q129_semantic_dedup,q138_dedup_pipeline
benchpart b q118_phash_neardup
benchpart c q32_dedup_minhash_lsh

env SPARK_GRAFT_RECALL_OUT=$R16/recall_2048x.json SPARK_GRAFT_RECALL_PLANTED_ONLY=1 \
  step recall_2048x sbt -batch "runMain graft.RecallProbe $REPO/target/sf2048-derived"

rm -rf "$REPO/target/sf2048-derived"

# same-era sf0.1 full sweep for the ratio denominators (+index phases)
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_OBSERVE=1 \
  SPARK_GRAFT_BENCH_OUT=$REPO/BENCH_QUERIES.json \
  step bench_sf01_full sbt -batch "runMain graft.Bench"

echo "[final] end $(date)"
