#!/bin/bash
# Closing leg: artifacts that must be re-measured at FINAL r17 HEAD —
# q32probe_100x (its first run predates keyClustered), fusion_512x
# (its first run OOM'd on the unrestricted Bm25 df broadcast, fixed),
# then the sf0.1 full bench on an idle host (the r16 gate-contention
# lesson: this MUST be the last Spark work of the round).
set -u
R17=/tmp/r17
REPO=/root/repo
TD=/root/testdata/sf0.1
LOG=$R17/logs
mkdir -p "$LOG"
require_disk() {
  local need=$1 label=$2; local avail
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
    echo "[r17] $(date +%H:%M:%S) FAILED $name rc=$rc — tail:"; tail -5 "$LOG/$name.log" | cut -c1-200
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

gen 100
step q32probe_100x 30 env SPARK_GRAFT_Q32_OUT=$R17/q32probe_100x.json \
  sbt -batch "runMain graft.Q32Probe $(D 100)"
rm -rf "$(D 100)"

gen 512
step fusion_512x 40 env SPARK_GRAFT_FUSION_OUT=$R17/fusion_512x.json \
  sbt -batch "runMain graft.FusionProbe $(D 512) 128"
rm -rf "$(D 512)"

step bench_sf01_full 30 env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_OBSERVE=1 \
  SPARK_GRAFT_BENCH_OUT=$REPO/BENCH_QUERIES.json \
  sbt -batch "runMain graft.Bench"

echo "[r17] close end $(date)"
