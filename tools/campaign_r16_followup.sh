#!/bin/bash
# Follow-up for the two steps the main r16 campaign lost:
#   - recall_256x (+ the P-sweep): the `${ps:+VAR=...}` expansion does
#     NOT count as a variable-assignment prefix in bash — the expanded
#     word became the command and the step silently never ran (the
#     main script's recall() is fixed to use `env`);
#   - fusion_100x: the first all-replica probe widening produced ids
#     past Int.MaxValue (the Bm25 query-id type) and the probe
#     require()-failed; bases are now capped to int-range replicas.
# Both corpora were dropped by the main campaign's disk discipline, so
# they are regenerated here (generation is deterministic).
set -u
R16=/tmp/r16
REPO=/root/repo
TD=/root/testdata/sf0.1
LOG=$R16/logs
mkdir -p "$LOG"

step() {
  local name=$1; shift
  echo "[followup] $(date +%H:%M:%S) START $name"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[followup] $(date +%H:%M:%S) FAILED $name rc=$rc — tail:"
    tail -5 "$LOG/$name.log" | cut -c1-200
  else
    echo "[followup] $(date +%H:%M:%S) done  $name"
  fi
  rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
  df -h / | tail -1 | awk '{print "[followup] disk: used "$3" avail "$4}'
  return $rc
}

if [ ! -d "$REPO/target/sf256-derived" ]; then
  SPARK_GRAFT_SCALE_REPLICAS=256 \
    step gen_256_followup sbt -batch "runMain graft.ScaleUp $TD $REPO/target/sf256-derived" || exit 1
fi
step q32probe_256x env SPARK_GRAFT_Q32_OUT=$R16/q32probe_256x.json \
  sbt -batch "runMain graft.Q32Probe $REPO/target/sf256-derived"
step recall_256x env SPARK_GRAFT_RECALL_OUT=$R16/recall_256x.json SPARK_GRAFT_RECALL_PLANTED_ONLY=0 \
  SPARK_GRAFT_RECALL_PSWEEP=2,3 \
  sbt -batch "runMain graft.RecallProbe $REPO/target/sf256-derived"
rm -rf "$REPO/target/sf256-derived"

SPARK_GRAFT_SCALE_REPLICAS=100 \
  step gen_100_followup sbt -batch "runMain graft.ScaleUp $TD $REPO/target/sf100-derived" || exit 1
step fusion_100x env SPARK_GRAFT_FUSION_OUT=$R16/fusion_100x.json \
  sbt -batch "runMain graft.FusionProbe $REPO/target/sf100-derived 128"
rm -rf "$REPO/target/sf100-derived"
echo "[followup] end $(date)"
