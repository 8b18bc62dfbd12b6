#!/usr/bin/env python3
"""Assemble SCALING_r19.json from the round-19 measurement artifacts.

Inputs (same host, under /tmp/r19 by tools/campaign_r19.sh; archived
in-repo at tools/r19/):
  bench_sf01_full.json             -- idle-host default-config sf0.1
                                      sweep (the ADVICE reconcile; also
                                      committed as BENCH_QUERIES.json)
  fusion_512x_defaultpool.json     -- VERDICT #3 done-criterion run:
                                      CPUS=32, default checkpoint level,
                                      on the bounded Bm25 scoring
                                      aggregate + DISK_ONLY postings
  stageprobe_q138_512x.json        -- q138 at 512x, widened st1
  stageprobe_q138_2048x_A.json     -- q138 at 2048x, HEAD default
                                      (continuous width + wide st1)
  stageprobe_q138_2048x_B.json     -- same era, r17-ish wall-first
                                      regime via env (fixed width 512,
                                      coarse st1) — the VERDICT #2
                                      bracket
  bench_1024x_{c,a1,a2,b}.json     -- the thrice-skipped 1024x bench
                                      column, measured (VERDICT #6)
  bench_4096x_q129.json            -- sixth decade, cheapest engine
  q32probe_4096x.json              -- sixth decade, q32 phase splits
  corpus_rows.json                 -- generation-time row snapshots

HYGIENE CONTRACT (r15 verdict #7, kept verbatim): every input above is
REQUIRED; if any is missing or unparseable this assembler REFUSES to
write SCALING_r19.json and exits 1 listing the holes. To ship with a
declared hole, move it into EXPECTED_MISSING with a reason.
"""
import json
import os
import sys

R19 = "/tmp/r19"

EXPECTED_MISSING: list[tuple[str, str]] = [
    ("recall_r19",
     "planted recall NOT re-measured this round — and for the first time the declaration is MECHANICAL, "
     "not prose: GeometryPinSpec fingerprints the hash constants, banding arithmetic, hyperplane "
     "literals, shingle n, and corpus-sizing CASE chains through the real execution paths and fails on "
     "any change (stamp a2f399b640924ca7b32ee32127123aa6, green at HEAD). The r19 diff touches join "
     "partitioning, checkpoint storage levels, and aggregate widths only; r17's four-decade recall "
     "points stand."),
]

REQUIRED = [
    "bench_sf01_full.json",
    "fusion_512x_defaultpool.json",
    "stageprobe_q138_512x.json",
    "stageprobe_q138_2048x_A.json",
    "stageprobe_q138_2048x_B.json",
    "bench_1024x_c.json", "bench_1024x_a1.json", "bench_1024x_a2.json", "bench_1024x_b.json",
    "bench_4096x_q129.json",
    "q32probe_4096x.json",
    "corpus_rows.json",
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
        p = os.path.join(R19, f)
        if not os.path.exists(p):
            holes.append(f"{f}: file missing")
        else:
            try:
                loaded = load(p)
                if f.startswith("stageprobe") and loaded.get("failed"):
                    holes.append(f"{f}: probe FAILED ({loaded['failed'][:100]})")
                if f.startswith("bench") and loaded.get("n_failed", 0):
                    holes.append(f"{f}: bench had failed queries ({loaded.get('failed')})")
            except Exception as e:
                holes.append(f"{f}: unparseable ({e})")
    if holes:
        print("[assemble] REFUSING to write SCALING_r19.json — measurement holes:", file=sys.stderr)
        for h in holes:
            print(f"  - {h}", file=sys.stderr)
        print("[assemble] measure them, or declare them in EXPECTED_MISSING with a reason.", file=sys.stderr)
        sys.exit(1)

    sf01 = load(f"{R19}/bench_sf01_full.json")
    out = {"note": NOTE, "heap": "8g (sbt default — the measured-faster regime, r16 A/B)"}
    if declared:
        out["missing"] = declared

    # 1024x column (VERDICT #6): merged per-engine parts
    q1024, res1024, vol1024 = {}, {}, {}
    cell_1024 = None
    for part in ("c", "a1", "a2", "b"):
        b = load(f"{R19}/bench_1024x_{part}.json")
        q1024.update(b["queries"])
        res1024.update(b.get("resources", {}))
        vol1024.update(b.get("volumes", {}))
        if b.get("cell_index_build_sec") is not None:
            cell_1024 = b["cell_index_build_sec"]
    out["sf1024_derived"] = dict(sorted(q1024.items()))
    out["sf1024_resources"] = res1024
    out["sf1024_volumes"] = vol1024
    if cell_1024 is not None:
        out["cell_index_build_sec_1024x"] = cell_1024
    base = sf01["queries"]
    out["ratio_at_1024x"] = {
        q: round(t / base[q], 2) for q, t in q1024.items() if base.get(q, 0) > 0
    }
    # the r18 four-engine 2048x column brackets this measurement from
    # above; the deliberate-skip slot is hereby RETIRED by measurement
    r18_2048 = {"q32_dedup_minhash_lsh": 566.508, "q34_dedup_embedding": 726.077,
                "q129_semantic_dedup": 36.029, "q138_dedup_pipeline": 792.118,
                "q118_phash_neardup": 1037.809}
    out["x2048_r18_over_x1024_r19_cross_era"] = {
        q: round(r18_2048[q] / t, 2) for q, t in q1024.items() if q in r18_2048 and t > 0
    }

    # 4096x sixth decade (VERDICT #7)
    b4096 = load(f"{R19}/bench_4096x_q129.json")
    out["sf4096_derived"] = dict(sorted(b4096["queries"].items()))
    out["sf4096_resources"] = b4096.get("resources", {})
    out["sf4096_volumes"] = b4096.get("volumes", {})
    if b4096.get("cell_index_build_sec") is not None:
        out["cell_index_build_sec_4096x"] = b4096["cell_index_build_sec"]
    out["q32_phase_attribution_4096x"] = load(f"{R19}/q32probe_4096x.json").get("phases", {})

    # q138 frontier: the VERDICT #1/#2 bracket
    out["q138_attribution"] = {
        "at_512x_widened_st1": stage_summary(load(f"{R19}/stageprobe_q138_512x.json")),
        "r18_at_512x_default_for_reference": {"sec": 152.4, "mem_spill_gb": 9.5, "disk_spill_gb": 5.4},
        "at_2048x_width_ab_same_era": {
            "note": "A = HEAD default (continuous keyClustered width + st1 checkpoint width-clustered at "
                    "1024KB-of-estimate/partition); B = the r17-ish wall-first regime via env "
                    "(KEYCLUSTER_EST_PER_PARTITION_KB=512 + PIPELINE_ST1_PER_PARTITION_KB=999999999 -> "
                    "coarse st1). Same era, same prebuilt-index stage-probe instrument, back-to-back runs.",
            "A_default_continuous_plus_wide_st1": stage_summary(load(f"{R19}/stageprobe_q138_2048x_A.json")),
            "B_oldwidth_coarse_st1_via_env": stage_summary(load(f"{R19}/stageprobe_q138_2048x_B.json")),
        },
    }

    out["fusion_planted_eval_512x_defaultpool"] = load(f"{R19}/fusion_512x_defaultpool.json")
    out["fusion_note"] = (
        "VERDICT #3 done criterion: this run used the DEFAULT pool (CPUS=32, default checkpoint level) on "
        "the bounded Bm25 scoring aggregate + DISK_ONLY postings checkpoint, and every reported number is "
        "bit-identical to tools/r18/fusion_512x.json (which needed CPUS=16 + CKPT_LEVEL=DISK_ONLY after "
        "two OOMs)."
    )

    out["corpus_rows"] = load(f"{R19}/corpus_rows.json")
    out["sf0.1"] = dict(sorted(sf01["queries"].items()))
    out["index_phases_sf0.1"] = sf01.get("index_phases", {})

    with open("/root/repo/SCALING_r19.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_r19.json; 1024x:", out["sf1024_derived"],
          "| 4096x:", out["sf4096_derived"])


NOTE = "PLACEHOLDER — filled in once all artifacts land"

if __name__ == "__main__":
    main()
