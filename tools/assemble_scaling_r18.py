#!/usr/bin/env python3
"""Assemble SCALING_r18.json from the round-18 measurement artifacts.

Inputs (all produced this round, same host, under /tmp/r18 by
tools/campaign_r18.sh and the follow-up A/B steps; archived in-repo at
tools/r18/):
  stageprobe_q34_512x.json         -- q34 at the r17 probe geometry with
                                      the SMJ->SHJ conversion GENUINELY
                                      engaged (advisory=threshold)
  q32probe_512x.json               -- q32 phase splits at r18 HEAD
                                      (scale-aware keyClustered width)
  stageprobe_q138_512x.json        -- q138 at 512x, default config
  stageprobe_q138_512x_f128.json   -- q138 at 512x, factor 128 +
                                      conversion (the negative result)
  stageprobe_q138_2048x.json       -- THE r17 weak item: per-stage
                                      attribution of the 282 GB spill
                                      (fixed width 512), measured before
                                      the width fix
  stageprobe_q138_2048x_oldwidth.json / _fix.json
                                   -- same-era A/B: r17's fixed width
                                      reproduced via env vs the
                                      continuous estimate-proportional
                                      width, prebuilt index both sides
  fusion_512x.json                 -- the r17 declared hole: widened
                                      fusion eval at the 512x decade
  bench_2048x.json                 -- merged per-engine 2048x columns,
                                      ALL FIVE engines incl. q118
  corpus_rows.json                 -- generation-time row snapshots
  ab_adv16/adv64/adv16_noshj.json  -- the sf0.1 A/B that made the SHJ
                                      conversion opt-in
  /root/repo/BENCH_QUERIES.json    -- the sf0.1 full sweep at r18 HEAD

HYGIENE CONTRACT (r15 verdict #7, kept verbatim): every input above is
REQUIRED; if any is missing or unparseable this assembler REFUSES to
write SCALING_r18.json and exits 1 listing the holes. To ship with a
declared hole, move it into EXPECTED_MISSING with a reason — the
artifact then carries an explicit `missing` field instead of silence.
"""
import json
import os
import sys

R18 = "/tmp/r18"

EXPECTED_MISSING: list[tuple[str, str]] = [
    ("recall_r18",
     "planted recall NOT re-measured this round: the LSH geometry, graft_lshbuckets kernel, and banding "
     "code are byte-unchanged since the r17 measurements (recall_256x/512x/2048x, all within 2 sigma of "
     "the band law at corpus-scaled L) and the r18 changes (join strategy, partition widths) cannot move "
     "which pairs collide. r17's four-decade recall points stand; cited, not re-claimed."),
    ("bench_1024x",
     "the 1024x bench column, declared missing in r16 and r17, is skipped again DELIBERATELY: the "
     "256x->512x->2048x bracket already pins the scaling exponent on both sides of it, so its marginal "
     "information does not justify a ~45-minute generation+bench window. Explicitly declared, not lost."),
    ("q32probe_100x_256x_r18",
     "q32 phase splits at 100x/256x not re-measured at r18 HEAD: the width change is validated by the "
     "512x probe (signature/verify phases zero-spill at the estimate-derived width) and the unit spec "
     "pins the estimate->width map; r17's 100x/256x probes stand for the in-row shingle-set claims."),
]

REQUIRED = [
    "stageprobe_q34_512x.json", "q32probe_512x.json",
    "stageprobe_q138_512x.json", "stageprobe_q138_512x_f128.json",
    "stageprobe_q138_2048x.json",
    "stageprobe_q138_2048x_oldwidth.json", "stageprobe_q138_2048x_fix.json",
    "stageprobe_q138_2048x_oldwidth2.json",
    "fusion_512x.json",
    "bench_2048x.json",
    "corpus_rows.json",
    "ab_adv16.json", "ab_adv64.json", "ab_adv16_noshj.json",
]


def load(p):
    with open(p) as f:
        return json.load(f)


def stage_summary(probe):
    st = probe.get("stages", [])
    out = {
        "sec": probe.get("sec"),
        "mem_spill_gb": round(sum(s["mem_spill"] for s in st) / 2**30, 1),
        "disk_spill_gb": round(sum(s["disk_spill"] for s in st) / 2**30, 1),
        "heaviest_stages": [
            {k: (round(s[k] / 2**30, 1) if k in ("mem_spill", "disk_spill", "shuffle_write", "shuffle_read", "input") else s[k])
             for k in ("stage", "tasks", "sec", "mem_spill", "disk_spill", "shuffle_write", "shuffle_read", "input")}
            for s in sorted(st, key=lambda s: -s["mem_spill"])[:6] if s["mem_spill"] > 2**30
        ],
    }
    if probe.get("failed"):
        out["failed"] = probe["failed"]
    return out


def main():
    declared = {k: v for k, v in EXPECTED_MISSING}
    holes = []
    for f in REQUIRED:
        if f in declared:
            continue
        p = os.path.join(R18, f)
        if not os.path.exists(p):
            holes.append(f"{f}: file missing")
        else:
            try:
                loaded = load(p)
                # a probe that crashed mid-run must not pass as a measurement
                if f.startswith("stageprobe") and loaded.get("failed"):
                    holes.append(f"{f}: probe FAILED ({loaded['failed'][:100]})")
            except Exception as e:
                holes.append(f"{f}: unparseable ({e})")
    if holes:
        print("[assemble] REFUSING to write SCALING_r18.json — measurement holes:", file=sys.stderr)
        for h in holes:
            print(f"  - {h}", file=sys.stderr)
        print("[assemble] measure them, or declare them in EXPECTED_MISSING with a reason.", file=sys.stderr)
        sys.exit(1)

    sf01 = load("/root/repo/BENCH_QUERIES.json")
    out = {"note": NOTE, "heap": "8g (sbt default — the measured-faster regime, r16 A/B)"}
    if declared:
        out["missing"] = declared

    b2048 = load(f"{R18}/bench_2048x.json")
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
    r17_2048 = {"q32_dedup_minhash_lsh": 583.902, "q34_dedup_embedding": 820.422,
                "q129_semantic_dedup": 34.935, "q138_dedup_pipeline": 660.769,
                "q118_phash_neardup": 1214.0}
    out["vs_r17_at_2048x"] = {
        q: round(t / r17_2048[q], 3) for q, t in out["sf2048_derived"].items() if q in r17_2048
    }

    # the genuinely-engaged SHJ conversion at the r17 512x geometry
    out["q34_shj_conversion_512x"] = {
        "r18_engaged": stage_summary(load(f"{R18}/stageprobe_q34_512x.json")),
        "r17_smj_in_memory_sec": 52.6,
        "note": "same factor-32 geometry as r17's probe; the r17 run could not convert "
                "(advisory 64m > threshold 16m) and sorted in memory",
    }

    out["q32_phase_attribution_512x"] = load(f"{R18}/q32probe_512x.json").get("phases", {})

    # q138: the r17 weak item, attributed and acted on
    out["q138_attribution"] = {
        "at_512x_default": stage_summary(load(f"{R18}/stageprobe_q138_512x.json")),
        "at_512x_factor128_conversion": stage_summary(load(f"{R18}/stageprobe_q138_512x_f128.json")),
        "at_2048x_fixed_width_512": stage_summary(load(f"{R18}/stageprobe_q138_2048x.json")),
        "at_2048x_width_ab": {
            "note": "A-B-A bracket, same regime (prebuilt index, stage probe), ~25 min apart each: "
                    "the host's era drift between the two A runs bounds the noise at ~7.5%",
            "A_oldwidth_via_env": stage_summary(load(f"{R18}/stageprobe_q138_2048x_oldwidth.json")),
            "B_continuous_width": stage_summary(load(f"{R18}/stageprobe_q138_2048x_fix.json")),
            "A2_oldwidth_via_env": stage_summary(load(f"{R18}/stageprobe_q138_2048x_oldwidth2.json")),
        },
    }

    out["fusion_planted_eval_512x"] = load(f"{R18}/fusion_512x.json")

    out["shj_conversion_sf01_ab"] = {
        "engaged_adv16": load(f"{R18}/ab_adv16.json"),
        "default_adv64": load(f"{R18}/ab_adv64.json"),
        "adv16_conversion_disabled": load(f"{R18}/ab_adv16_noshj.json"),
    }

    out["corpus_rows"] = load(f"{R18}/corpus_rows.json")
    out["sf0.1"] = dict(sorted(sf01["queries"].items()))
    out["index_phases_sf0.1"] = sf01.get("index_phases", {})

    with open("/root/repo/SCALING_r18.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_r18.json; 2048x:", out["sf2048_derived"],
          "| vs r17:", out["vs_r17_at_2048x"])


NOTE = (
    "round-18 scaling: columns measured at round-18 HEAD, same host (tools/campaign_r18.sh; 8g heap; "
    "sequential per-engine JVMs; disk-headroom gates + spill-dir cleanup + STOP buffer). THE ROUND'S TWO "
    "MECHANISMS, both from the r18 advice/verdict: (1) the SMJ->shuffled-hash conversion GENUINELY engages "
    "for the first time — DynamicJoinSelection.preferShuffledHashJoin requires advisory <= localMapThreshold "
    "before it reads partition sizes (Spark 4.1.2 bytecode), which r17's 64m/16m pairing failed, so every "
    "r17 'conversion' claim was a silent no-op. Engaged (decade steps export SPARK_GRAFT_AQE_ADVISORY_MB=16): "
    "q34 512x probe 33.6 s vs 52.6 r17 (zero spill, no sorts, one exchange read twice); q34 2048x 726.1 s vs "
    "820.4 (-11.5%). NOT engaged by default: an sf0.1 A/B measured the conversion DOUBLING the iterative "
    "kmeans/cell family (cell build 16.5 s off vs 33 s on — per-task hash builds on KB partitions), so the "
    "session default keeps it off and a PlanSpec pin asserts the decade pairing still plans the no-sort shape. "
    "(2) q138's 282 GB frontier spill — the r17 weak item — is ATTRIBUTED: 187 of 305 GB was the two "
    "keyClustered aggregates at fixed width 512 (gram count 118 GB, covered-position distinct 69 GB — "
    "keys/512 per task outgrows the 150 MB execution pool at the fifth decade), ~49 GB the substringClean "
    "map/span stages over the checkpoint's 52 coarse partitions. ACTED ON: keyClustered width is now "
    "CONTINUOUS in the input's Catalyst size estimate (est/128KB clamped to [base, 128x base], base under a "
    "4 MB floor — anchors: sf0.1 ~0.15 MB -> base, 512x 62 MB -> ~500 = the r17-measured zero-spill width, "
    "2048x ~250 MB -> ~2000), which also recovers the r17 sf0.1 regression (q32 4.32->3.06/2.58, q87 "
    "4.45->2.29/1.98 across the two eras measured). q138 2048x bench: spill 282+75 -> 68+31 GB (-76% mem); "
    "wall 792 vs 660.8 r17 is CROSS-era (this host's sweep median read +9% and identical-code probe phases "
    "+30% today); the same-era width A/B in q138_attribution.at_2048x_width_ab is the honest comparison. "
    "q118's 2048x point is finally re-measured at HEAD: 1037.8 s (r16: 1214). fusion_512x (the r17 declared "
    "hole) landed: 96 planted cross-modal probes at the decade, fused rank-1 80.2%, all 96 in top-3, lexical "
    "never first, semantic 77/96 — the 100x fusion win replicates; operational caveat: the probe needed "
    "SPARK_GRAFT_CPUS=16 + CKPT_LEVEL=DISK_ONLY (two 32-core OOMs logged — the Bm25 scoring aggregate plus "
    "checkpoint residency cannot share the 32-way 8g pool at this decade)."
)

if __name__ == "__main__":
    main()
