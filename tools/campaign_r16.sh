#!/bin/bash
# Round-16 scaling campaign. Lessons from the r15 2048x death encoded:
#   - every step runs SEQUENTIALLY in its own forked JVM with FULL
#     stdout+stderr kept in its own log (the r15 campaign's grep filter
#     threw away the query names, so the ENOSPC culprit was never
#     identified);
#   - stray spark temp/blockmgr dirs are removed between steps and the
#     free-disk line is printed after each, so a disk leak is visible
#     the step it starts;
#   - corpora are deleted right after their last consumer (the 2048x
#     corpus + spill footprint does not fit this sandbox's disk
#     otherwise), with row counts snapshotted at generation time;
#   - a FAILED step prints loudly and the campaign continues to the
#     steps that don't depend on it — the assembler then refuses to
#     write a note over the hole (tools/assemble_scaling_r16.py).
#
# Heap: the DEFAULT 8g (the driver-gate regime, and the one the r15
# columns were measured under). A 96g first attempt measured 2-6x
# SLOWER across the board: the 200M-row checkpoint blocks fit in the
# big heap as live deserialized objects and GC scanned them forever,
# where the small heap pushes them to disk-backed storage and stays
# lean. The signature-pass OOM that motivated a bigger heap was fixed
# at the source instead (declarative graft_minhash, bounded
# fallbackThreshold).
set -u
R16=/tmp/r16
REPO=/root/repo
TD=/root/testdata/sf0.1
LOG=$R16/logs
mkdir -p "$LOG"

PAIR_QUERIES=q32_dedup_minhash_lsh,q34_dedup_embedding,q118_phash_neardup,q129_semantic_dedup,q138_dedup_pipeline

step() { # step <name> <cmd...>
  local name=$1; shift
  echo "[campaign] $(date +%H:%M:%S) START $name"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[campaign] $(date +%H:%M:%S) FAILED $name rc=$rc — tail:"
    tail -5 "$LOG/$name.log" | cut -c1-200
  else
    echo "[campaign] $(date +%H:%M:%S) done  $name"
  fi
  rm -rf /tmp/spark-* /tmp/blockmgr-* 2>/dev/null
  df -h / | tail -1 | awk '{print "[campaign] disk: used "$3" avail "$4}'
  return $rc
}

gen() { # gen <mult-label> <replicas>
  local lbl=$1 reps=$2
  SPARK_GRAFT_SCALE_REPLICAS=$reps \
    step "gen_$lbl" sbt -batch "runMain graft.ScaleUp $TD $REPO/target/sf$lbl-derived" || return 1
  python3 "$REPO/tools/snapshot_rows.py" "sf${lbl}_derived" "$REPO/target/sf$lbl-derived" "$R16/corpus_rows.json"
}

bench() { # bench <mult-label> <xlabel>
  local lbl=$1 x=$2
  SPARK_GRAFT_SF_DIR=$REPO/target/sf$lbl-derived SPARK_GRAFT_OBSERVE=1 \
    SPARK_GRAFT_BENCH_ONLY=$PAIR_QUERIES SPARK_GRAFT_BENCH_OUT=$R16/bench_$x.json \
    step "bench_$x" sbt -batch "runMain graft.Bench"
}

recall() { # recall <mult-label> <xlabel> [planted_only] [psweep]
  local lbl=$1 x=$2 po=${3:-0} ps=${4:-}
  SPARK_GRAFT_RECALL_OUT=$R16/recall_$x.json SPARK_GRAFT_RECALL_PLANTED_ONLY=$po \
    ${ps:+SPARK_GRAFT_RECALL_PSWEEP=$ps} \
    step "recall_$x" sbt -batch "runMain graft.RecallProbe $REPO/target/sf$lbl-derived"
}

fusion() { # fusion <mult-label> <xlabel> <nprobes>
  local lbl=$1 x=$2 np=$3
  SPARK_GRAFT_FUSION_OUT=$R16/fusion_$x.json \
    step "fusion_$x" sbt -batch "runMain graft.FusionProbe $REPO/target/sf$lbl-derived $np"
}

cellbuild() { # cellbuild <mult-label> <xlabel>
  local lbl=$1 x=$2
  SPARK_GRAFT_BUILD_OUT=$R16/cellbuild_$x.json \
    step "cellbuild_$x" sbt -batch "runMain graft.CellBuildProbe $REPO/target/sf$lbl-derived"
}

drop_corpus() { rm -rf "$REPO/target/sf$1-derived"; echo "[campaign] dropped sf$1-derived"; }

echo "[campaign] r16 start $(date)"

# ---- 10x (tiny; kept on disk) ----
gen 1 10 && bench 1 10x

# ---- 100x: bench + full-truth recall + wide fusion ----
gen 100 100 && {
  bench 100 100x
  recall 100 100x 0
  fusion 100 100x 128
}

# ---- 256x (already generated this round): bench + full recall + P-sweep ----
python3 "$REPO/tools/snapshot_rows.py" sf256_derived "$REPO/target/sf256-derived" "$R16/corpus_rows.json"
bench 256 256x
recall 256 256x 0 2,3
drop_corpus 100

# ---- 512x: bench + planted recall + build phases ----
gen 512 512 && {
  bench 512 512x
  recall 512 512x 1
  cellbuild 512 512x
  drop_corpus 512
}

# ---- 1024x: bench + planted recall + wide fusion + build phases ----
gen 1024 1024 && {
  bench 1024 1024x
  recall 1024 1024x 1
  fusion 1024 1024x 128
  cellbuild 1024 1024x
  drop_corpus 1024
}

# ---- 2048x: the decade r15 claimed and never measured ----
drop_corpus 256
gen 2048 2048 && {
  bench 2048 2048x
  recall 2048 2048x 1
  drop_corpus 2048
}

echo "[campaign] r16 end $(date)"
