#!/bin/bash
# Second resume: after the declarative-simhash + DISK_ONLY-checkpoint +
# keyClustered commits. The 512x corpus on disk is reused (the fixes
# are layout-independent); 256x regen + 2048x follow. Same hygiene.
set -u
R17=/tmp/r17
REPO=/root/repo
TD=/root/testdata/sf0.1
LOG=$R17/logs
mkdir -p "$LOG"
require_disk() {
  local need=$1 label=$2
  local avail
  avail=$(df --output=avail -BG / | tail -1 | tr -dc '0-9')
  [ "$avail" -lt "$need" ] && { echo "[r17] REFUSING $label: ${avail}G free < ${need}G"; return 1; }
  echo "[r17] disk ok for $label: ${avail}G free (need ${need}G)"
}
step() {
  local name=$1 need=$2; shift 2
  [ -f "$R17/STOP" ] && { echo "[r17] STOP file present — halting before $name"; exit 0; }
  require_disk "$need" "$name" || return 1
  echo "[r17] $(date +%H:%M:%S) START $name"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[r17] $(date +%H:%M:%S) FAILED $name rc=$rc — tail:"
    tail -5 "$LOG/$name.log" | cut -c1-200
  else
    echo "[r17] $(date +%H:%M:%S) done  $name"
  fi
  rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
  df -h / | tail -1 | awk '{print "[r17] disk: used "$3" avail "$4}'
  return $rc
}
gen() {
  step "gen_$1" 20 env SPARK_GRAFT_SCALE_REPLICAS=$1 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
    sbt -batch "runMain graft.ScaleUp $TD $REPO/target/sf$1-derived"
  python3 "$REPO/tools/snapshot_rows.py" "sf$1_derived" "$REPO/target/sf$1-derived" "$R17/corpus_rows.json"
}
D() { echo "$REPO/target/sf$1-derived"; }

step q32probe_512x 50 env SPARK_GRAFT_Q32_OUT=$R17/q32probe_512x.json \
  sbt -batch "runMain graft.Q32Probe $(D 512)"
step stageprobe_q138_512x 50 env SPARK_GRAFT_STAGEPROBE_OUT=$R17/stageprobe_q138_512x.json \
  sbt -batch "runMain graft.StageProbe q138_dedup_pipeline $(D 512)"
step fusion_512x 40 env SPARK_GRAFT_FUSION_OUT=$R17/fusion_512x.json \
  sbt -batch "runMain graft.FusionProbe $(D 512) 128"
step recall_512x 40 env SPARK_GRAFT_RECALL_OUT=$R17/recall_512x.json SPARK_GRAFT_RECALL_PLANTED_ONLY=1 \
  sbt -batch "runMain graft.RecallProbe $(D 512)"
rm -rf "$(D 512)"

gen 256
step q32probe_256x 40 env SPARK_GRAFT_Q32_OUT=$R17/q32probe_256x.json \
  sbt -batch "runMain graft.Q32Probe $(D 256)"
rm -rf "$(D 256)"

gen 2048
benchpart() {
  local sfx=$1 qs=$2; shift 2
  step "bench_2048x_$sfx" 60 env SPARK_GRAFT_SF_DIR=$(D 2048) SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_ONLY=$qs SPARK_GRAFT_BENCH_OUT=$R17/bench_2048x_$sfx.json \
    "$@" sbt -batch "runMain graft.Bench"
}
benchpart c q32_dedup_minhash_lsh env SPARK_GRAFT_CKPT_LEVEL=DISK_ONLY
benchpart a1 q34_dedup_embedding env SPARK_GRAFT_AQE_INITIAL_FACTOR=128
benchpart a2 q129_semantic_dedup,q138_dedup_pipeline
step recall_2048x 60 env SPARK_GRAFT_RECALL_OUT=$R17/recall_2048x.json SPARK_GRAFT_RECALL_PLANTED_ONLY=1 \
  SPARK_GRAFT_AQE_INITIAL_FACTOR=128 \
  sbt -batch "runMain graft.RecallProbe $(D 2048)"
benchpart b q118_phash_neardup
python3 "$REPO/tools/merge_bench_parts.py" "$R17" || true
rm -rf "$(D 2048)"
echo "[r17] resume2 campaign end $(date)"
