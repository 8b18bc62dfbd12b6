#!/usr/bin/env python3
"""Assemble SCALING_r16.json from the round-16 measurement artifacts.

Inputs (all produced this round, same host, under /tmp/r16):
  bench_10x.json .. bench_2048x.json   -- per-decade pair-engine bench
                                          columns (min-of-2, observed,
                                          default 8g heap)
  recall_100x.json, recall_256x.json   -- RecallProbe full-truth runs
                                          (256x also carries the P-sweep)
  recall_512x.json .. recall_2048x.json-- planted-only runs
  fusion_100x.json, fusion_1024x.json  -- FusionProbe wide evals (n=128)
  cellbuild_512x.json, cellbuild_1024x.json -- CellBuildProbe phase splits
  corpus_rows.json                     -- generation-time row snapshots
  /root/repo/BENCH_QUERIES.json        -- the sf0.1 full sweep (+phases)

HYGIENE CONTRACT (r15 verdict #7 — a failed measurement must never
become a claimed one): every input above is REQUIRED. If any is
missing, this assembler REFUSES to write SCALING_r16.json and exits 1
listing the holes; to ship an artifact with a declared hole, move the
decade/probe into EXPECTED_MISSING below with a reason — the artifact
then carries an explicit `missing` field instead of silence, and the
note generator never mentions data it didn't load.
"""
import json
import os
import sys

R16 = "/tmp/r16"

# (key, reason) — holes the round explicitly declares instead of measuring.
# The round was time-boxed hard: two heap-regime A/Bs, a per-stage q32 spill
# hunt, and two campaign-script bugs (a bash assignment-prefix gotcha and an
# env-vs-shell-function exec that burned one 19-minute 2048x generation)
# consumed the budget the full matrix needed. Each hole below states what
# stands in its place; none is silently claimed anywhere in this artifact.
EXPECTED_MISSING: list[tuple[str, str]] = [
    ("bench_1024x.json",
     "time-boxed out; the 512x and 2048x columns bracket it at r16 HEAD, and SCALING_r15's 1024x column "
     "measured byte-identical q34/q118/q129/q138 query code over the identical (deterministic) corpus"),
    ("recall_256x.json",
     "the campaign step silently no-op'd on a bash gotcha (expansion words are not assignment prefixes) "
     "and the re-run was time-boxed out; r16's measured 100x/512x/2048x planted-recall points plus "
     "SCALING_r15's 256x point (identical q34 code + corpus) bracket it; the q129 P-sweep that rode this "
     "step (SPARK_GRAFT_RECALL_PSWEEP, implemented + spec-covered this round) is the next round's first "
     "measurement"),
    ("recall_1024x.json",
     "time-boxed out; SCALING_r15's 1024x planted recall (R(0.90)=0.909 at L=27, precision 1.0) measured "
     "byte-identical q34 code over the identical corpus and remains the operative point"),
    ("fusion_100x.json",
     "the widened probe (all int-range replicas' X bases, n=128, rank distributions) landed in code this "
     "round but its first campaign run require()-failed on the Bm25 Int query-id contract before the cap "
     "was added, and the re-run was time-boxed out; SCALING_r15's 8-probe 256x fusion win stands; the "
     "n>=64 multi-decade measurement is a next-round deliverable"),
    ("fusion_1024x.json", "same as fusion_100x.json"),
    ("cellbuild_512x.json",
     "the phase-split probe was time-boxed out, but the packed-argmin rebuild effect it was to adjudicate "
     "is already measured in THIS artifact's cell_index_build_sec: 512x build 66.3 s vs r15's 176.3 s "
     "(2.66x faster), 512x/256x ratio 1.59 vs r15's 2.47 for 2x data"),
    ("cellbuild_1024x.json", "same as cellbuild_512x.json (no 1024x corpus was staged this round)"),
    ("recall_2048x.json",
     "the planted-only probe DIED on ENOSPC (SPILL_OUT_OF_MEMORY: No space left on device, 06:15) while "
     "the campaign's own spill competed with the 2048x corpus for the last ~45-75 GB of disk; q34's 2048x "
     "bench had died on the same ENOSPC seven minutes earlier (stage 286) and q32's 2048x run OOM'd the "
     "8g heap (stage 15, the shingle distinct) — so the fifth decade is UNMEASURED for exactly the two "
     "engines it was to certify (both failures are carried verbatim in this artifact's "
     "sf2048_derived_failed). Round 17's first measurement, with pre-flight disk-headroom checks"),
]

REQUIRED = [
    "bench_10x.json", "bench_100x.json", "bench_256x.json",
    "bench_512x.json", "bench_1024x.json", "bench_2048x.json",
    "recall_100x.json", "recall_256x.json", "recall_512x.json",
    "recall_1024x.json", "recall_2048x.json",
    "fusion_100x.json", "fusion_1024x.json",
    "cellbuild_512x.json", "cellbuild_1024x.json",
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
        p = os.path.join(R16, f)
        if not os.path.exists(p):
            holes.append(f"{f}: file missing")
        else:
            try:
                load(p)
            except Exception as e:
                holes.append(f"{f}: unparseable ({e})")
    if holes:
        print("[assemble] REFUSING to write SCALING_r16.json — measurement holes:", file=sys.stderr)
        for h in holes:
            print(f"  - {h}", file=sys.stderr)
        print("[assemble] measure them, or declare them in EXPECTED_MISSING with a reason.", file=sys.stderr)
        sys.exit(1)

    decades = [
        ("sf1_derived", "10x", "bench_10x.json"),
        ("sf100_derived", "100x", "bench_100x.json"),
        ("sf256_derived", "256x", "bench_256x.json"),
        ("sf512_derived", "512x", "bench_512x.json"),
        ("sf1024_derived", "1024x", "bench_1024x.json"),
        ("sf2048_derived", "2048x", "bench_2048x.json"),
    ]
    cols = {}
    for name, _, f in decades:
        if f not in declared:
            cols[name] = load(f"{R16}/{f}")
    sf01 = load("/root/repo/BENCH_QUERIES.json")

    out = {"note": NOTE, "heap": os.environ.get("SPARK_DRIVER_MEM", "8g (sbt default)")}
    if declared:
        out["missing"] = declared
    out["sf0.1"] = {k: v for k, v in sorted(sf01["queries"].items())}
    for name, col in cols.items():
        out[name] = {k: v for k, v in sorted(col["queries"].items())}
        # a decade column that carries per-query failures must surface them —
        # a missing key in the column must never read as "not attempted"
        if col.get("failed"):
            out[f"{name}_failed"] = col["failed"]

    for name, mult, _ in decades:
        if name not in out:
            continue
        base = out["sf0.1"]
        ratios = {}
        for q, t in out[name].items():
            if q in base and base[q] > 0:
                ratios[q] = round(t / base[q], 2)
        out[f"ratio_at_{mult}"] = dict(sorted(ratios.items(), key=lambda kv: -kv[1]))

    vols = {name: col.get("volumes") or {} for name, col in cols.items() if col.get("volumes")}
    out["volumes"] = vols

    snap = load(f"{R16}/corpus_rows.json")
    n_doc, n_emb = dict(snap["documents"]), dict(snap["embeddings"])
    missing_rows = [name for name in cols if name not in n_emb]
    if missing_rows:
        print(f"[assemble] REFUSING: no corpus_rows snapshot for {missing_rows}", file=sys.stderr)
        sys.exit(1)
    out["corpus_rows"] = {"documents": n_doc, "embeddings": n_emb}

    # the corpus-scaled q34 geometry per decade (mirrors
    # DedupSimQueries.embPlanesFor / embTablesForPlanes)
    import math as _math

    def emb_planes(n):
        return next((p for p in range(2, 21) if (64 << p) >= n), 20)

    def emb_tables(m):
        q = 1 - _math.acos(0.90) / _math.pi
        qm = q ** m
        return next((l for l in range(1, 65) if 1 - (1 - qm) ** l >= 0.90), 64)

    geom = {name: {"m": emb_planes(n), "L": emb_tables(emb_planes(n))}
            for name, n in n_emb.items() if name in cols}
    out["q34_geometry"] = geom

    checks = []
    top = [d for d, _, _ in decades
           if d in vols and d in ("sf256_derived", "sf512_derived", "sf1024_derived", "sf2048_derived")]
    for q, point, table in [
        ("q34_dedup_embedding", "q34_candidates", n_emb),
        ("q118_phash_neardup", "hamming_candidates", n_doc),
        ("q129_semantic_dedup", "q129_candidates", n_emb),
        ("q32_dedup_minhash_lsh", "minhash_candidates", n_doc),
    ]:
        rates = {}
        for d in top:
            c = (vols.get(d, {}).get(q, {}).get(point)
                 or vols.get(d, {}).get("q138_dedup_pipeline", {}).get(point))
            n = table.get(d)
            if c and n:
                rates[d] = c / n
        if len(rates) >= 2:
            note = ""
            if q == "q34_dedup_embedding":
                rates = {d: r / geom[d]["L"] for d, r in rates.items()}
                note = "per TABLE (candidates/vector/L — L is corpus-scaled since r15)"
            vals = list(rates.values())
            spread = max(vals) / min(vals)
            checks.append({
                "engine": q, "point": point, "note": note,
                "candidates_per_row": {k: round(v, 4) for k, v in rates.items()},
                "max_over_min": round(spread, 3),
                "linear_within_1.35x": spread <= 1.35,
            })
    out["volume_linearity"] = checks

    recall = {}
    for mult in ("100x", "256x", "512x", "1024x", "2048x"):
        f = f"recall_{mult}.json"
        if f not in declared:
            recall[f"at_{mult}"] = load(f"{R16}/{f}")
    out["q34_planted_recall"] = {
        k: {kk: vv for kk, vv in v.items() if kk != "probe_sweep"} for k, v in recall.items()
    }
    # the q129 probe-count contract sweep (r15 verdict #4)
    sweeps = {k: v["probe_sweep"] for k, v in recall.items() if "probe_sweep" in v}
    if sweeps:
        out["q129_probe_sweep"] = sweeps

    fus = {}
    for mult in ("100x", "1024x"):
        f = f"fusion_{mult}.json"
        if f not in declared:
            fus[f"at_{mult}"] = load(f"{R16}/{f}")
    out["fusion_planted_eval"] = fus

    builds = {}
    for mult in ("512x", "1024x"):
        f = f"cellbuild_{mult}.json"
        if f not in declared:
            builds[f"at_{mult}"] = load(f"{R16}/{f}")
    out["cell_build_adjudication"] = builds

    out["cell_index_build_sec"] = {
        name: col.get("cell_index_build_sec")
        for name, col in cols.items()
        if col.get("cell_index_build_sec") is not None
    }
    # q32's per-stage spill attribution (the r16 fix evidence): phase
    # wall/spill/rows from the Q32Probe main at the decades it ran
    probes = {}
    for label, f in (("100x", "q32probe_sf100-derived.json"), ("512x", "q32probe_512x.json")):
        pth = os.path.join(R16, f)
        if os.path.exists(pth):
            probes[f"at_{label}"] = load(pth).get("phases", {})
    if probes:
        out["q32_stage_attribution"] = probes

    out["index_phases_sf0.1"] = sf01.get("index_phases", {})
    out["resources"] = {name: col.get("resources", {}) for name, col in cols.items()}

    with open("/root/repo/SCALING_r16.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_r16.json;",
          "linearity:", [(c["engine"], c["linear_within_1.35x"]) for c in checks])


NOTE = (
    "round-16 scaling: columns re-measured at round-16 HEAD, same host (tools/campaign_r16*.sh; default "
    "8g heap — the driver-gate regime, chosen by A/B: a 96g attempt ran 2-6x SLOWER with checkpoint "
    "blocks resident as live objects; sequential per-engine JVMs, full per-step stderr kept, corpora "
    "dropped after their last consumer; the 2048x bench is SINGLE-pass in per-engine JVMs so one death "
    "cannot lose the rest — see `missing` for the declared holes and what stands in each one's place). "
    "THE ROUND'S HEADLINE: the two r15 spill shapes are dead at the source, and the fifth decade is "
    "measured for THREE of the five pair engines (q129 40.6 s = 2.7% of linear, q138 534 s = 9.5%, q118 "
    "1214 s = 13.6%, cell build 288 s ~linear from 512x); q34's 2048x bench and recall probe both died on "
    "ENOSPC and q32's OOM'd the 8g heap — carried in sf2048_derived_failed and `missing`, NOT claimed. "
    "(1) Every k-means assignment now runs on a packed (d2*2^bits+cid) long "
    "key — a primitive min / declarative graft_minkp top-K inside whole-stage-codegen HashAggregate, qa "
    "re-joined after the aggregate — because min(struct)+first(qa)/typed-min2 planned as SortAggregate / "
    "ObjectHashAggregate's 128-key sort fallback and externally sorted the whole N*sqrt(k) fan-out WITH "
    "the 64-dim payload (r15's 722 GB assign + 692 GB fine-round spills). Rebuild totals: 256x 71.5->41.8 s, "
    "512x 176.3->66.3 s (2.66x faster), 512x/256x ratio 2.47->1.59 for 2x data. (2) q32's spill was "
    "stage-attributed by the new Q32Probe (q32_stage_attribution): the exact verify now semi-joins the "
    "shingle universe down to candidate docs, the signature aggregate repartitions by doc_id first (its "
    "partial maps covered the whole doc key space — 26 GB spill / 87 of 97 s in ONE stage at 100x), and "
    "the typed-aggregate fallback threshold is bounded at 32k keys. q32 at 100x: 97.7 -> 20.4 s, zero "
    "spill; residual >=256x spill is the shared distinct+df-cap checkpoint's aggregate state vs the "
    "0.25 GB/core local heap (53 of 69 GB at 512x; a 24g A/B halves it; the declared next lever is the "
    "in-row array_distinct shingle set — intra-doc dupes are the only dupes, so the corpus-wide distinct "
    "shuffle is algorithmically removable). The q129 probe-count sweep and the widened fusion eval landed "
    "as code (assignMultiProbe(P), SPARK_GRAFT_RECALL_PSWEEP, FusionProbe rank distributions over n=128 "
    "int-range bases) but their measurements were time-boxed out — declared in `missing`, NOT claimed."
)

if __name__ == "__main__":
    main()
