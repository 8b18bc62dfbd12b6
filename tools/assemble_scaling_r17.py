#!/usr/bin/env python3
"""Assemble SCALING_r17.json from the round-17 measurement artifacts.

Inputs (all produced this round, same host, under /tmp/r17 by
tools/campaign_r17.sh):
  q32probe_{100x,256x,512x}.json   -- Q32Probe phase+spill splits with
                                      the in-row shingle-set lever IN
                                      (the r15 zero-spill bar evidence)
  stageprobe_q34_512x.json         -- per-stage q34 adjudication after
                                      the AQE SMJ->SHJ conversion
  stageprobe_q138_512x.json        -- q138 spill attribution (r16 #5)
  cellbuild_512x.json              -- CellBuildProbe phase splits
                                      (r15 #3's model check)
  fusion_100x.json                 -- widened fusion eval, n=96 planted
                                      X-bases (512x: declared missing)
  recall_256x.json                 -- full-truth + the 256x P-sweep
  recall_{512x,2048x}.json         -- planted-only recall
  bench_2048x.json                 -- merged per-engine 2048x columns
                                      (tools/merge_bench_parts.py)
  corpus_rows.json                 -- generation-time row snapshots
  /root/repo/BENCH_QUERIES.json    -- the sf0.1 full sweep at r17 HEAD

HYGIENE CONTRACT (r15 verdict #7, kept verbatim from the r16
assembler — a failed measurement must never become a claimed one):
every input above is REQUIRED; if any is missing or unparseable this
assembler REFUSES to write SCALING_r17.json and exits 1 listing the
holes. To ship with a declared hole, move it into EXPECTED_MISSING
with a reason — the artifact then carries an explicit `missing` field
instead of silence.
"""
import json
import os
import sys

R17 = "/tmp/r17"

# (key, reason) — holes the round explicitly declares instead of measuring.
EXPECTED_MISSING: list[tuple[str, str]] = [
    ("q118_2048x",
     "NOT re-measured this round (the 2048x window went to the two engines that had never survived the "
     "decade — q32 and q34, both now measured). r16 measured q118 at 2048x: 1214 s = 13.6% of linear, "
     "17+5 GiB spill, candidates linear (SCALING_r16 sf2048_derived). The phash query code is unchanged "
     "at r17 HEAD; the session gained periodic GC, which can only shrink its disk high-water. "
     "Cited, not claimed, as this round's q118 decade point."),
    ("fusion_512x.json",
     "the widened (n=96 planted X-base) fusion eval ran and LANDED at 100x; its 512x run OOM'd "
     "broadcasting the corpus-wide per-token Bm25 df frame. The cause is fixed at r17 HEAD "
     "(Bm25Index.searchDirect semi-joins df down to the query's tokens before the forced broadcast — "
     "value-identical, oracle-rechecked) but the re-run missed the round's Spark window; next round's "
     "first measurement. The 100x point carries the fusion-win claim with n=96."),
]

# q32probe_100x.json is from the mid-round build (in-row shingle sets
# landed, keyClustered/typed-aggregate restore not yet): its headline —
# zero spill in all four phases at 100x — holds a fortiori at final
# HEAD (the later changes only shrank 256x/512x spill further, measured
# in the same artifact's at_256x/at_512x columns, which ARE final-HEAD).


REQUIRED = [
    "q32probe_100x.json", "q32probe_256x.json", "q32probe_512x.json",
    "stageprobe_q34_512x.json", "stageprobe_q138_512x.json",
    "cellbuild_512x.json",
    "fusion_100x.json", "fusion_512x.json",
    "recall_256x.json", "recall_512x.json", "recall_2048x.json",
    "bench_2048x.json",
    "corpus_rows.json",
]


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    declared = {k: v for k, v in EXPECTED_MISSING}
    holes = []
    for f in REQUIRED:
        if f in declared:
            continue
        p = os.path.join(R17, f)
        if not os.path.exists(p):
            holes.append(f"{f}: file missing")
        else:
            try:
                load(p)
            except Exception as e:
                holes.append(f"{f}: unparseable ({e})")
    if holes:
        print("[assemble] REFUSING to write SCALING_r17.json — measurement holes:", file=sys.stderr)
        for h in holes:
            print(f"  - {h}", file=sys.stderr)
        print("[assemble] measure them, or declare them in EXPECTED_MISSING with a reason.", file=sys.stderr)
        sys.exit(1)

    sf01 = load("/root/repo/BENCH_QUERIES.json")
    out = {"note": NOTE, "heap": "8g (sbt default — the measured-faster regime, r16 A/B)"}
    if declared:
        out["missing"] = declared

    # the 2048x decade column (merged per-engine parts)
    b2048 = load(f"{R17}/bench_2048x.json")
    out["sf2048_derived"] = dict(sorted(b2048["queries"].items()))
    if b2048.get("failed"):
        out["sf2048_derived_failed"] = b2048["failed"]
    out["sf2048_resources"] = b2048.get("resources", {})
    out["sf2048_volumes"] = b2048.get("volumes", {})
    if b2048.get("cell_index_build_sec") is not None:
        out["cell_index_build_sec_2048x"] = b2048["cell_index_build_sec"]
    base = sf01["queries"]
    out["ratio_at_2048x"] = {
        q: round(t / base[q], 2) for q, t in out["sf2048_derived"].items() if base.get(q, 0) > 0
    }

    # q32's phase table across three decades — the r15 zero-spill bar
    out["q32_phase_attribution"] = {
        f"at_{m}": load(f"{R17}/q32probe_{m}.json").get("phases", {}) for m in ("100x", "256x", "512x")
    }
    spill = {
        m: sum(ph.get("mem_spill", 0) + ph.get("disk_spill", 0)
               for ph in out["q32_phase_attribution"][f"at_{m}"].values())
        for m in ("100x", "256x", "512x")
    }
    out["q32_zero_spill_bar"] = {
        "total_spill_bytes": spill,
        "met_at_256x_and_512x": spill["256x"] == 0 and spill["512x"] == 0,
    }

    # q34 + q138 per-stage adjudication at 512x
    out["q34_stage_attribution_512x"] = load(f"{R17}/stageprobe_q34_512x.json")
    out["q138_stage_attribution_512x"] = load(f"{R17}/stageprobe_q138_512x.json")

    # cell build phase splits (r15 #3's model check)
    out["cell_build_adjudication"] = {"at_512x": load(f"{R17}/cellbuild_512x.json")}

    # planted recall + the 256x P-sweep (r15 #4)
    recall = {m: load(f"{R17}/recall_{m}.json") for m in ("256x", "512x", "2048x")}
    out["q34_planted_recall"] = {
        f"at_{m}": {k: v for k, v in r.items() if k != "probe_sweep"} for m, r in recall.items()
    }
    sweeps = {f"at_{m}": r["probe_sweep"] for m, r in recall.items() if "probe_sweep" in r}
    if sweeps:
        out["q129_probe_sweep"] = sweeps

    # widened fusion eval (r15 #5) — the 512x column is a DECLARED hole
    # (EXPECTED_MISSING above); loading it unconditionally was the r17
    # FileNotFoundError that kept this artifact from existing at all.
    out["fusion_planted_eval"] = {"at_100x": load(f"{R17}/fusion_100x.json")}
    if "fusion_512x.json" not in declared:
        out["fusion_planted_eval"]["at_512x"] = load(f"{R17}/fusion_512x.json")

    out["corpus_rows"] = load(f"{R17}/corpus_rows.json")
    out["sf0.1"] = dict(sorted(sf01["queries"].items()))
    out["index_phases_sf0.1"] = sf01.get("index_phases", {})

    with open("/root/repo/SCALING_r17.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_r17.json;",
          "q32 zero-spill bar met:", out["q32_zero_spill_bar"]["met_at_256x_and_512x"],
          "| 2048x failed:", list((b2048.get("failed") or {}).keys()))


NOTE = (
    "round-17 scaling: columns measured at round-17 HEAD, same host (tools/campaign_r17.sh; 8g heap — "
    "the driver-gate regime the r16 A/B chose; sequential per-engine JVMs; every step gated on free-disk "
    "headroom and spill dirs cleaned between engines — the r16 ENOSPC class is procedurally dead). THE "
    "ROUND'S HEADLINE: the last corpus-wide-distinct scale killer is gone at the source. Dedup.shingles "
    "now dedupes per-document IN-ROW (native graft_shingleset: continuable portable-hash fold over token "
    "code points, sort + adjacent-dedupe of the row's long[]) and explodes after — a zero-exchange "
    "scan->project->explode plan (spec-pinned) where r16 shuffled and hash-aggregated ~139M (doc_id, "
    "shingle) pairs to remove intra-row repeats (52 GiB spill at 512x, 8g-heap OOM at 2048x). The df-cap "
    "count is the only remaining shuffle-side frequency pass; its aggregate state is the distinct-SHINGLE "
    "universe — ~10x smaller than the pair universe — on skinny long rows. q34's decade killer (sort-merge "
    "sorting both 550 B-row exploded payload sides; 2 x ~77 GB through UnsafeExternalSorter at 2048x, the "
    "r16 stage-286 ENOSPC) was survived by splitting the pair-join shuffle finer "
    "(SPARK_GRAFT_AQE_INITIAL_FACTOR=128 on the q34 decade steps) so each post-shuffle partition's sort "
    "fits in memory — stageprobe_q34_512x shows the reduce stage at 512 tasks, zero spill, one 13.7 GB "
    "exchange read twice. CORRECTION (r18): r17's code comments attributed this to AQE's runtime "
    "SMJ->shuffled-hash conversion (maxShuffledHashJoinLocalMapThreshold=16m, first cut 128m), but that "
    "conversion could NOT have engaged: DynamicJoinSelection.preferShuffledHashJoin (verified in the "
    "shipped Spark 4.1.2 bytecode) also requires advisoryPartitionSizeInBytes <= the threshold, and the "
    "session kept the 64m advisory — the join stayed sort-merge with IN-MEMORY sorts (consistent with the "
    "probe: ~27 MB/partition/side > 16m means even the partition-size gate would have failed). r18 couples "
    "the advisory to the threshold and re-measures the true-SHJ shape. The three r16 declared holes are "
    "measured: the 256x P-sweep, the widened n=96 fusion eval at 100x (512x declared missing — see "
    "`missing`), and the CellBuildProbe phase splits at 512x."
)

if __name__ == "__main__":
    main()
