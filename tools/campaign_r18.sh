#!/bin/bash
# Round-18 measurement campaign. Priorities from the r17 verdict + r18
# advice:
#   1. The SMJ->SHJ conversion now GENUINELY engages (advisory was 64m
#      vs the 16m threshold — the config-level gate in
#      DynamicJoinSelection.preferShuffledHashJoin made r17's
#      "conversion" a silent no-op): re-measure q34 at 512x/2048x with
#      the true no-sort shape, and A/B q138 with factor 128 (its body
#      and gram joins are SMJ sorts at decade partition sizes).
#   2. Stage-attribute q138 at 2048x (the one remaining `weak`: 282 GB
#      mem-spill unattributed at that decade) and act on it.
#   3. fusion_512x on the fixed Bm25 df path (declared hole).
#   4. q118's 2048x point at current HEAD (declared twice).
#   5. sf0.1 full sweep at r18 HEAD (keyClustered is now scale-aware —
#      the q32 family's ~2x sf0.1 regression should be recovered) +
#      INDEX_COSTS refresh (r15-era).
#
# Hygiene (r16/r17 contract): every step gates on free-disk headroom,
# cleans spark spill dirs after, halts on a STOP file, and the campaign
# never overlaps the driver gate — STOP with buffer before round end.
# Phases are invoked explicitly so findings can steer the next phase:
#   tools/campaign_r18.sh sf01      # full sf0.1 sweep + INDEX_COSTS
#   tools/campaign_r18.sh p512      # 512x probes (q34 SHJ, q138 A/B, fusion)
#   tools/campaign_r18.sh gen2048   # generate the 2048x corpus (kept)
#   tools/campaign_r18.sh p2048     # q138 stage attribution at 2048x
#   tools/campaign_r18.sh bench2048 [extra-q138-env...]  # decade bench parts
#   tools/campaign_r18.sh drop2048  # reclaim the corpus
set -u
R18=/tmp/r18
REPO=/root/repo
TD=/root/testdata/sf0.1
LOG=$R18/logs
mkdir -p "$LOG"

require_disk() { # require_disk <GB> <label>
  local need=$1 label=$2
  local avail
  avail=$(df --output=avail -BG / | tail -1 | tr -dc '0-9')
  if [ "$avail" -lt "$need" ]; then
    echo "[r18] REFUSING $label: ${avail}G free < ${need}G needed"
    return 1
  fi
  echo "[r18] disk ok for $label: ${avail}G free (need ${need}G)"
}

step() { # step <name> <need_gb> <cmd...>
  local name=$1 need=$2; shift 2
  [ -f "$R18/STOP" ] && { echo "[r18] STOP file present — halting before $name"; exit 0; }
  require_disk "$need" "$name" || return 1
  echo "[r18] $(date +%H:%M:%S) START $name"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[r18] $(date +%H:%M:%S) FAILED $name rc=$rc — tail:"
    tail -5 "$LOG/$name.log" | cut -c1-200
  else
    echo "[r18] $(date +%H:%M:%S) done  $name"
  fi
  rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
  df -h / | tail -1 | awk '{print "[r18] disk: used "$3" avail "$4}'
  return $rc
}

gen() { # gen <replicas>
  step "gen_$1" 20 env SPARK_GRAFT_SCALE_REPLICAS=$1 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
    sbt -batch "runMain graft.ScaleUp $TD $REPO/target/sf$1-derived"
  python3 "$REPO/tools/snapshot_rows.py" "sf$1_derived" "$REPO/target/sf$1-derived" "$R18/corpus_rows.json"
}

D() { echo "$REPO/target/sf$1-derived"; }

case "${1:-}" in
sf01)
  step bench_sf01_full 30 env SPARK_GRAFT_SF_DIR=$TD SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_OUT=$REPO/BENCH_QUERIES.json \
    sbt -batch "runMain graft.Bench"
  step index_costs 30 env SPARK_GRAFT_SF_DIR=$TD \
    sbt -batch "runMain graft.IndexCosts"
  ;;
p512)
  [ -d "$(D 512)" ] || gen 512
  # same geometry as r17's probe (factor 32) — but the conversion can
  # now actually fire; compare vs r17's 52.6 s in-memory-SMJ point
  step stageprobe_q34_512x 50 env SPARK_GRAFT_STAGEPROBE_OUT=$R18/stageprobe_q34_512x.json \
    SPARK_GRAFT_AQE_INITIAL_FACTOR=32 SPARK_GRAFT_AQE_ADVISORY_MB=16 \
    sbt -batch "runMain graft.StageProbe q34_dedup_embedding $(D 512)"
  step q32probe_512x 50 env SPARK_GRAFT_Q32_OUT=$R18/q32probe_512x.json \
    sbt -batch "runMain graft.Q32Probe $(D 512)"
  # q138 A/B at 512x: default vs factor-128 (fine partitions put the
  # md5-body and gram joins under the 16 MB SHJ conversion bound)
  step stageprobe_q138_512x 50 env SPARK_GRAFT_STAGEPROBE_OUT=$R18/stageprobe_q138_512x.json \
    sbt -batch "runMain graft.StageProbe q138_dedup_pipeline $(D 512)"
  step stageprobe_q138_512x_f128 50 env SPARK_GRAFT_STAGEPROBE_OUT=$R18/stageprobe_q138_512x_f128.json \
    SPARK_GRAFT_AQE_INITIAL_FACTOR=128 SPARK_GRAFT_AQE_ADVISORY_MB=16 \
    sbt -batch "runMain graft.StageProbe q138_dedup_pipeline $(D 512)"
  # the declared r17 hole: widened fusion eval at 512x on the fixed
  # Bm25 df path (semi-join to query tokens before the broadcast)
  step fusion_512x 40 env SPARK_GRAFT_FUSION_OUT=$R18/fusion_512x.json \
    sbt -batch "runMain graft.FusionProbe $(D 512) 128"
  rm -rf "$(D 512)"
  ;;
gen2048)
  gen 2048
  ;;
p2048)
  # r17 comparability first (default factor, default ckpt level —
  # the a2 bench regime), THEN the candidate fix gets its own run via
  # bench2048 extra env once this names the spill owners
  step stageprobe_q138_2048x 70 env SPARK_GRAFT_STAGEPROBE_OUT=$R18/stageprobe_q138_2048x.json \
    sbt -batch "runMain graft.StageProbe q138_dedup_pipeline $(D 2048)"
  ;;
p2048b)
  shift
  step stageprobe_q138_2048x_fix 70 env SPARK_GRAFT_STAGEPROBE_OUT=$R18/stageprobe_q138_2048x_fix.json \
    "$@" sbt -batch "runMain graft.StageProbe q138_dedup_pipeline $(D 2048)"
  ;;
bench2048)
  shift
  benchpart() { # benchpart <suffix> <queries> [extra env...]
    local sfx=$1 qs=$2; shift 2
    step "bench_2048x_$sfx" 60 env SPARK_GRAFT_SF_DIR=$(D 2048) SPARK_GRAFT_OBSERVE=1 \
      SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_ONLY=$qs SPARK_GRAFT_BENCH_OUT=$R18/bench_2048x_$sfx.json \
      "$@" sbt -batch "runMain graft.Bench"
  }
  benchpart c q32_dedup_minhash_lsh env SPARK_GRAFT_CKPT_LEVEL=DISK_ONLY
  benchpart a1 q34_dedup_embedding env SPARK_GRAFT_AQE_INITIAL_FACTOR=128 SPARK_GRAFT_AQE_ADVISORY_MB=16
  benchpart a2 q129_semantic_dedup,q138_dedup_pipeline "$@"
  benchpart b q118_phash_neardup
  python3 "$REPO/tools/merge_bench_parts.py" "$R18" || true
  ;;
drop2048)
  rm -rf "$(D 2048)"
  ;;
*)
  echo "usage: $0 sf01|p512|gen2048|p2048|p2048b|bench2048|drop2048"
  exit 2
  ;;
esac
echo "[r18] phase ${1:-} end $(date)"
