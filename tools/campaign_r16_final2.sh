#!/bin/bash
# Second endgame attempt: final.sh's `env VAR=... step ...` exec'd the
# shell FUNCTION `step` as a program (env knows no functions), so every
# bench no-op'd and the cleanup deleted the 19-minute 2048x corpus.
# Env prefixes now live INSIDE step's command ("step name env VAR=..
# sbt .."). Steps are ordered by round-priority so the deadline
# truncates from the bottom: q34/q129/q138 + the cell build first
# (the flagship 2048x contract points), planted recall second, q32
# third, q118 last.
set -u
R16=/tmp/r16
REPO=/root/repo
TD=/root/testdata/sf0.1
LOG=$R16/logs
mkdir -p "$LOG"

step() {
  local name=$1; shift
  echo "[final2] $(date +%H:%M:%S) START $name"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[final2] $(date +%H:%M:%S) FAILED $name rc=$rc — tail:"
    tail -5 "$LOG/$name.log" | cut -c1-200
  else
    echo "[final2] $(date +%H:%M:%S) done  $name"
  fi
  rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
  df -h / | tail -1 | awk '{print "[final2] disk: used "$3" avail "$4}'
  return $rc
}

if [ ! -f "$REPO/target/sf2048-derived/documents.parquet/_SUCCESS" ]; then
  step gen_2048 env SPARK_GRAFT_SCALE_REPLICAS=2048 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
    sbt -batch "runMain graft.ScaleUp $TD $REPO/target/sf2048-derived" || exit 1
fi
python3 "$REPO/tools/snapshot_rows.py" sf2048_derived "$REPO/target/sf2048-derived" "$R16/corpus_rows.json"

benchpart() { # benchpart <suffix> <queries>
  step "bench_2048x_$1" env SPARK_GRAFT_SF_DIR=$REPO/target/sf2048-derived SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_ONLY=$2 SPARK_GRAFT_BENCH_OUT=$R16/bench_2048x_$1.json \
    sbt -batch "runMain graft.Bench"
  python3 "$REPO/tools/merge_bench_parts.py" || true
}
benchpart a q34_dedup_embedding,q129_semantic_dedup,q138_dedup_pipeline
step recall_2048x env SPARK_GRAFT_RECALL_OUT=$R16/recall_2048x.json SPARK_GRAFT_RECALL_PLANTED_ONLY=1 \
  sbt -batch "runMain graft.RecallProbe $REPO/target/sf2048-derived"
benchpart c q32_dedup_minhash_lsh
benchpart b q118_phash_neardup

rm -rf "$REPO/target/sf2048-derived"

step bench_sf01_full env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_OBSERVE=1 \
  SPARK_GRAFT_BENCH_OUT=$REPO/BENCH_QUERIES.json \
  sbt -batch "runMain graft.Bench"

echo "[final2] end $(date)"
