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
EXPECTED_MISSING: list[tuple[str, str]] = []

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
    out["index_phases_sf0.1"] = sf01.get("index_phases", {})
    out["resources"] = {name: col.get("resources", {}) for name, col in cols.items()}

    with open("/root/repo/SCALING_r16.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_r16.json;",
          "linearity:", [(c["engine"], c["linear_within_1.35x"]) for c in checks])


NOTE = (
    "round-16 scaling: every column re-measured at round-16 HEAD in one same-host campaign "
    "(tools/campaign_r16.sh; default 8g heap — the driver-gate regime; sequential per-engine JVMs, full per-step stderr kept, "
    "spill dirs cleaned and corpora dropped after their last consumer). THE ROUND'S HEADLINE: the fifth "
    "decade (2048x) is MEASURED for real this time (r15 claimed it and the run had died on ENOSPC), and "
    "the two spill shapes the r15 verdict named are gone at the code level: (1) KMeans assignment "
    "aggregates run on a packed (d2*2^bits+cid) long key inside whole-stage-codegen HashAggregate with "
    "qa re-joined after the aggregate, so nothing candidate-fan-out-sized is sorted (the 1024x build's "
    "722 GB assign-phase spill and the fine rounds' 692 GB were exactly those sorts); (2) q32's exact "
    "verify semi-joins the shingle universe down to candidate docs before the intersection joins, and "
    "graft's small-fixed-state typed aggregates stay on ObjectHashAggregate's hash path via a bounded "
    "fallbackThreshold=128k (the 128-key default sort-sorted the whole corpus per aggregate — q32's "
    "28 GB spill at 256x, and the OOM that killed the first r16 256x probe at the 8g test heap). "
    "The q129 probe-count contract is now a measured sweep (q129_probe_sweep: P in {2,3} at 256x under "
    "the same frozen geometry — catch + probe-shared coverage per cosine vs candidates/vector), and the "
    "fusion eval is a distributional measurement (n=128 probes across every replica's planted X bases at "
    "100x and 1024x, rank p50/p90/max + rank-1 rates per channel) instead of 8 means at one decade."
)

if __name__ == "__main__":
    main()
