#!/bin/bash
# Round-19 measurement campaign. Priorities from the r18 verdict +
# advice:
#   1. (ADVICE medium) Re-run the default-config sf0.1 bench on an
#      IDLE host: the r18-committed BENCH_QUERIES.json shows 2-4x
#      regressions on queries the diff never touched (q138/q139/q140,
#      cell build) — reconcile the canonical artifact with the
#      narrative or annotate it as loaded-host noise.
#   2. (VERDICT #1/#2) q138 at 2048x with the widened st1 checkpoint
#      (DedupPipeline keyClusteredWide): the substringClean map/span
#      stages (r18: 231-233, 52 tasks, ~49 GB spill) should flatten
#      AND the +20% single-box wall (52 maps x ~2000 reduce files)
#      should recover. Same-regime A-B: A = HEAD default (continuous
#      width + wide st1), B = r17-ish regime via
#      SPARK_GRAFT_KEYCLUSTER_EST_PER_PARTITION_KB=512 +
#      SPARK_GRAFT_PIPELINE_ST1_PER_PARTITION_KB=999999999 (st1 back
#      to coarse). Done = wall(A) <= wall(B) at equal-or-better spill.
#   3. (VERDICT #3) fusion_512x at the DEFAULT pool (CPUS=32, default
#      checkpoint level) on the bounded Bm25 scoring aggregate —
#      numbers must match tools/r18/fusion_512x.json.
#   4. (VERDICT #6) the 1024x bench column: measure it once (three
#      deliberate skips is a standing declaration earning nothing).
#   5. (VERDICT #7) sixth decade: 4096x points for the two cheapest
#      engines (q129, q32) — or a measured ENOSPC adjudication.
#
# Hygiene (r16/r17 contract, unchanged): disk gates per step, spill
# dirs cleaned after each, STOP file halts, no sbt compile while any
# step runs, stop with buffer before round end.
set -u
R19=/tmp/r19
REPO=/root/repo
TD=/root/testdata/sf0.1
LOG=$R19/logs
mkdir -p "$LOG"

require_disk() { # require_disk <GB> <label>
  local need=$1 label=$2
  local avail
  avail=$(df --output=avail -BG / | tail -1 | tr -dc '0-9')
  if [ "$avail" -lt "$need" ]; then
    echo "[r19] REFUSING $label: ${avail}G free < ${need}G needed"
    return 1
  fi
  echo "[r19] disk ok for $label: ${avail}G free (need ${need}G)"
}

step() { # step <name> <need_gb> <cmd...>
  local name=$1 need=$2; shift 2
  [ -f "$R19/STOP" ] && { echo "[r19] STOP file present — halting before $name"; exit 0; }
  require_disk "$need" "$name" || return 1
  echo "[r19] $(date +%H:%M:%S) START $name"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[r19] $(date +%H:%M:%S) FAILED $name rc=$rc — tail:"
    tail -5 "$LOG/$name.log" | cut -c1-200
  else
    echo "[r19] $(date +%H:%M:%S) done  $name"
  fi
  rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
  df -h / | tail -1 | awk '{print "[r19] disk: used "$3" avail "$4}'
  return $rc
}

gen() { # gen <replicas>
  step "gen_$1" 20 env SPARK_GRAFT_SCALE_REPLICAS=$1 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
    sbt -batch "runMain graft.ScaleUp $TD $REPO/target/sf$1-derived"
  python3 "$REPO/tools/snapshot_rows.py" "sf$1_derived" "$REPO/target/sf$1-derived" "$R19/corpus_rows.json"
}

D() { echo "$REPO/target/sf$1-derived"; }

case "${1:-}" in
sf01)
  # idle-host default-config refresh: the ONE canonical sf0.1 artifact
  step bench_sf01_full 30 env SPARK_GRAFT_SF_DIR=$TD SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_OUT=$R19/bench_sf01_full.json \
    sbt -batch "runMain graft.Bench"
  ;;
p512)
  [ -d "$(D 512)" ] || gen 512
  # VERDICT #3 done-criterion run: default pool, default ckpt level,
  # 32 cores — the r18 run needed CPUS=16 + DISK_ONLY after two OOMs
  step fusion_512x_defaultpool 50 env SPARK_GRAFT_FUSION_OUT=$R19/fusion_512x_defaultpool.json \
    sbt -batch "runMain graft.FusionProbe $(D 512) 128"
  # quick width sanity for the widened st1 at the cheaper decade
  step stageprobe_q138_512x 50 env SPARK_GRAFT_STAGEPROBE_OUT=$R19/stageprobe_q138_512x.json \
    sbt -batch "runMain graft.StageProbe q138_dedup_pipeline $(D 512)"
  rm -rf "$(D 512)"
  ;;
p1024)
  [ -d "$(D 1024)" ] || gen 1024
  # the thrice-skipped 1024x bench column, measured once (VERDICT #6)
  step bench_1024x_c 50 env SPARK_GRAFT_SF_DIR=$(D 1024) SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_ONLY=q32_dedup_minhash_lsh \
    SPARK_GRAFT_BENCH_OUT=$R19/bench_1024x_c.json SPARK_GRAFT_CKPT_LEVEL=DISK_ONLY \
    sbt -batch "runMain graft.Bench"
  step bench_1024x_a1 50 env SPARK_GRAFT_SF_DIR=$(D 1024) SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_ONLY=q34_dedup_embedding \
    SPARK_GRAFT_BENCH_OUT=$R19/bench_1024x_a1.json \
    SPARK_GRAFT_AQE_INITIAL_FACTOR=128 SPARK_GRAFT_AQE_ADVISORY_MB=16 \
    sbt -batch "runMain graft.Bench"
  step bench_1024x_a2 50 env SPARK_GRAFT_SF_DIR=$(D 1024) SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_ONLY=q129_semantic_dedup,q138_dedup_pipeline \
    SPARK_GRAFT_BENCH_OUT=$R19/bench_1024x_a2.json \
    sbt -batch "runMain graft.Bench"
  step bench_1024x_b 50 env SPARK_GRAFT_SF_DIR=$(D 1024) SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_ONLY=q118_phash_neardup \
    SPARK_GRAFT_BENCH_OUT=$R19/bench_1024x_b.json \
    sbt -batch "runMain graft.Bench"
  rm -rf "$(D 1024)"
  ;;
p2048)
  [ -d "$(D 2048)" ] || gen 2048
  # A: HEAD default — continuous width + the widened st1 checkpoint
  step stageprobe_q138_2048x_A 70 env SPARK_GRAFT_STAGEPROBE_OUT=$R19/stageprobe_q138_2048x_A.json \
    sbt -batch "runMain graft.StageProbe q138_dedup_pipeline $(D 2048)"
  # B: the r17-ish wall-first regime (fixed-512 aggregate width,
  # coarse st1) — the same-regime bracket VERDICT #2 demands
  step stageprobe_q138_2048x_B 70 env SPARK_GRAFT_STAGEPROBE_OUT=$R19/stageprobe_q138_2048x_B.json \
    SPARK_GRAFT_KEYCLUSTER_EST_PER_PARTITION_KB=512 \
    SPARK_GRAFT_PIPELINE_ST1_PER_PARTITION_KB=999999999 \
    sbt -batch "runMain graft.StageProbe q138_dedup_pipeline $(D 2048)"
  ;;
drop2048)
  rm -rf "$(D 2048)"
  ;;
p4096)
  [ -d "$(D 4096)" ] || gen 4096
  # sixth decade, cheapest engines first (VERDICT #7); each step's
  # disk gate IS the ENOSPC adjudicator — a refusal names the number
  step bench_4096x_q129 70 env SPARK_GRAFT_SF_DIR=$(D 4096) SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_ONLY=q129_semantic_dedup \
    SPARK_GRAFT_BENCH_OUT=$R19/bench_4096x_q129.json \
    sbt -batch "runMain graft.Bench"
  step q32probe_4096x 70 env SPARK_GRAFT_Q32_OUT=$R19/q32probe_4096x.json \
    sbt -batch "runMain graft.Q32Probe $(D 4096)"
  rm -rf "$(D 4096)"
  ;;
*)
  echo "usage: $0 sf01|p512|p1024|p2048|drop2048|p4096"
  exit 2
  ;;
esac
echo "[r19] phase ${1:-} end $(date)"
