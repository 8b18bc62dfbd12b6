#!/usr/bin/env python3
"""Assemble SCALING_r14.json from the round-14 measurement artifacts.

Inputs (all produced this round, same host):
  /tmp/r14/bench_10x.json ... bench_1024x.json   -- per-decade bench columns
                                                    (min-of-2, volumes via
                                                    SPARK_GRAFT_OBSERVE=1)
  /tmp/r14/recall_100x.json, recall_256x.json    -- RecallProbe planted truth
  /tmp/r14/cell_append.json                      -- CellAppendProbe premium chart
  /root/repo/BENCH_QUERIES.json                  -- the sf0.1 full sweep (+phases)

The linearity assertion (r13 verdict #4): candidates must scale ~N
between adjacent measured decades for the pair engines, within
tolerance; violations are listed rather than hidden.
"""
import json
import sys

R14 = "/tmp/r14"


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    cols = {
        "sf1_derived": load(f"{R14}/bench_10x.json"),
        "sf5_derived": load(f"{R14}/bench_50x.json"),
        "sf100_derived": load(f"{R14}/bench_100x.json"),
        "sf256_derived": load(f"{R14}/bench_256x.json"),
        "sf512_derived": load(f"{R14}/bench_512x.json"),
        "sf1024_derived": load(f"{R14}/bench_1024x.json"),
    }
    sf01 = load("/root/repo/BENCH_QUERIES.json")

    out = {"note": NOTE}
    out["sf0.1"] = {k: v for k, v in sorted(sf01["queries"].items())}
    for name, col in cols.items():
        out[name] = {k: v for k, v in sorted(col["queries"].items())}

    # ratios vs sf0.1 (data x10 per named decade step)
    for name, mult in [("sf1_derived", "10x"), ("sf5_derived", "50x"),
                       ("sf100_derived", "100x"), ("sf256_derived", "256x"),
                       ("sf512_derived", "512x"), ("sf1024_derived", "1024x")]:
        base = out["sf0.1"]
        ratios = {}
        for q, t in out[name].items():
            if q in base and base[q] > 0:
                ratios[q] = round(t / base[q], 2)
        out[f"ratio_at_{mult}"] = dict(sorted(ratios.items(), key=lambda kv: -kv[1]))

    # measured volumes per decade (the standing instrument's output)
    vols = {}
    # corpus row counts per decade (documents / embeddings incl. planted)
    n_doc = {"sf256_derived": 1304576, "sf512_derived": 2609152, "sf1024_derived": 5218304}
    n_emb = {"sf256_derived": 536576, "sf512_derived": 1073152, "sf1024_derived": 2146304}
    for name, col in cols.items():
        v = col.get("volumes") or {}
        if v:
            vols[name] = v
    out["volumes"] = vols

    # linearity assertion: candidates/N constant within tolerance across
    # the three top decades (256/512/1024)
    checks = []
    for q, point, ncorpus in [
        ("q34_dedup_embedding", "q34_candidates", n_emb),
        ("q118_phash_neardup", "hamming_candidates", n_doc),
    ]:
        rates = {}
        for d in ("sf256_derived", "sf512_derived", "sf1024_derived"):
            c = vols.get(d, {}).get(q, {}).get(point)
            if c:
                rates[d] = c / ncorpus[d]
        if len(rates) >= 2:
            vals = list(rates.values())
            spread = max(vals) / min(vals)
            checks.append({
                "engine": q, "point": point,
                "candidates_per_row": {k: round(v, 2) for k, v in rates.items()},
                "max_over_min": round(spread, 3),
                "linear_within_1.25x": spread <= 1.25,
            })
    out["volume_linearity"] = checks

    out["q34_planted_recall"] = {
        "at_100x": load(f"{R14}/recall_100x.json"),
        "at_256x": load(f"{R14}/recall_256x.json"),
    }
    out["cell_append_premium"] = load(f"{R14}/cell_append.json")
    out["cell_index_build_sec"] = {
        name: col.get("cell_index_build_sec")
        for name, col in cols.items()
        if col.get("cell_index_build_sec") is not None
    }
    out["index_phases_sf0.1"] = sf01.get("index_phases", {})
    out["resources"] = {name: col.get("resources", {}) for name, col in cols.items()}

    extra = sys.argv[1] if len(sys.argv) > 1 else None
    if extra:
        out["quality_at_256x"] = load(extra)

    with open("/root/repo/SCALING_r14.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_r14.json;",
          "linearity:", [(c["engine"], c["linear_within_1.25x"]) for c in checks])


NOTE = (
    "round-14 scaling: every column re-measured at round-14 HEAD in one same-host session; "
    "ALL derived corpora regenerated WITH planted controlled-cosine duplicate families "
    "(+4.8% embedding rows, +1.9% doc rows — absolute times are not directly comparable to r13 columns; "
    "the volumes object is the new standing instrument that grades the pair engines era-independently, "
    "emitted by SPARK_GRAFT_OBSERVE=1 with zero plan impact when off). "
    "THE ROUND'S HEADLINE: q34's high-cosine recall is now MEASURED, not law-fitted — "
    "planted families give n_true=3200/band at 100x and 8192/band at 256x; measured "
    "R(0.85)/R(0.90)/R(0.95) = 0.794/0.940/0.993 at m=12 and 0.659/0.853/0.982 at m=14, every band inside "
    "the binomial 2-sigma of R(c)=1-(1-q^m)^L, precision 1.0 (q34_planted_recall). The same truth MEASURED "
    "the SemDeDup route's recall ceiling: cell-exact scoring is capped by k-means co-location "
    "(0.95-cosine pairs co-cluster 52-58%, 75-79% caught) — an N-independent ceiling vs q34's m-decaying "
    "recall; contracts corrected in the operator docs (routes cross near N~67M). "
    "THE 1024x DECADE (new: 2.1M vectors / 5.2M docs) EXPOSED THE ROUND'S CONSTANT: q118's materialized "
    "strip cached 181 BIGINT elements per doc (~8 GB at 5.2M docs in a 20 GB heap) and the pigeonhole "
    "join's 256 MB execution pages triggered GCLocker retry storms with 20-minute stalls; byte values are "
    "0..255, so the strip is now SMALLINT (4x smaller cache, identical semantics, oracle-green) and the "
    "column completed with zero q118 spill. Volume linearity ASSERTED from measured counts: "
    "q34 candidates/vector 46.2/49.9/54.4 and q118 candidates/doc 126.5/139.1/153.3 across 256/512/1024x — "
    "within 1.25x spread (the drift is the occupancy sawtooth between power-of-two geometry steps, not "
    "superlinearity; wall-clock super-linearity at 1024x decomposes into linear candidates + spill/era). "
    "q141's dual-truth eval at 256x (quality_at_256x): each channel scores 10/10 hits@10 on ITS OWN truth "
    "and 0/10 on the other (the two truths are disjoint on this corpus); equal-weight RRF splits the fused "
    "list exactly 5/5 — fused MRR 1.0 under bm25, 0.5 under cosine — the declared dead-channel contract "
    "made a measured, symmetric number instead of a one-sided defect reading. Cell maintenance: compaction "
    "(threshold 4 files/bucket) keeps the consumer read flat across 8 append batches (cell_append_premium: "
    "no-compact batch-8 read 0.168 s at 9 files/bucket vs 0.083 s compacted; rewrite costs ~1-2.7 s at 100x, "
    "priced 0.28 s at sf0.1 in index_phases vs a 4.7 s rebuild). Headline sf0.1 bench 129.7 s / 142 queries "
    "min-of-2 (r13: 138.5 s) with per-family index_phases now in the bench artifact."
)

if __name__ == "__main__":
    main()
