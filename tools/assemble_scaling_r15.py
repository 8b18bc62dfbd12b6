#!/usr/bin/env python3
"""Assemble SCALING_r15.json from the round-15 measurement artifacts.

Inputs (all produced this round, same host, under /tmp/r15):
  bench_10x.json .. bench_2048x.json  -- per-decade bench columns
                                         (min-of-2, SPARK_GRAFT_OBSERVE=1)
  recall_100x.json, recall_256x.json  -- RecallProbe full-truth runs
  recall_512x.json[, recall_1024x]    -- RecallProbe planted-only runs
  fusion_256x.json                    -- FusionProbe cross-modal eval
  cellbuild_512x.json, cellbuild_1024x.json -- CellBuildProbe phase splits
  cell_append.json                    -- CellAppendProbe premium chart
  /root/repo/BENCH_QUERIES.json       -- the sf0.1 full sweep (+phases)

All derived corpora were REGENERATED at r15 HEAD (cross-modal X/S/T
families + the semi-join doc-twin fix), so absolute times are not
directly comparable to r14 columns; volumes remain the era-independent
grade, now including the q129 multi-probe candidate counts.
"""
import json
import os
import sys

R15 = "/tmp/r15"


def load(p):
    with open(p) as f:
        return json.load(f)


def maybe(p):
    return load(p) if os.path.exists(p) else None


def main():
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
        c = maybe(f"{R15}/{f}")
        if c is not None:
            cols[name] = c
    sf01 = load("/root/repo/BENCH_QUERIES.json")

    out = {"note": NOTE}
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

    vols = {}
    for name, col in cols.items():
        v = col.get("volumes") or {}
        if v:
            vols[name] = v
    out["volumes"] = vols

    # corpus row counts per decade, read from the parquet FOOTERS of
    # the actual generated dirs (incl. the r15 planted families)
    import pyarrow.parquet as pq
    import glob as _glob

    def rows(path):
        return sum(pq.ParquetFile(f).metadata.num_rows
                   for f in _glob.glob(os.path.join(path, "*.parquet")))

    dirn = {"sf1_derived": "sf1-derived", "sf100_derived": "sf100-derived",
            "sf256_derived": "sf256-derived", "sf512_derived": "sf512-derived",
            "sf1024_derived": "sf1024-derived", "sf2048_derived": "sf2048-derived"}
    # counts snapshotted at generation time survive mid-decade corpus
    # cleanup (the 2048x spill headroom); live footers fill the rest
    snap = maybe(f"{R15}/corpus_rows.json") or {"documents": {}, "embeddings": {}}
    n_doc, n_emb = dict(snap["documents"]), dict(snap["embeddings"])
    for name in cols:
        d = f"/root/repo/target/{dirn[name]}"
        if name not in n_emb and os.path.isdir(os.path.join(d, "documents.parquet")):
            n_doc[name] = rows(os.path.join(d, "documents.parquet"))
            n_emb[name] = rows(os.path.join(d, "embeddings.parquet"))
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
            for name, n in n_emb.items()}
    out["q34_geometry"] = geom

    checks = []
    top = [d for d in ("sf256_derived", "sf512_derived", "sf1024_derived", "sf2048_derived") if d in vols]
    for q, point, table in [
        ("q34_dedup_embedding", "q34_candidates", n_emb),
        ("q118_phash_neardup", "hamming_candidates", n_doc),
        ("q129_semantic_dedup", "q129_candidates", n_emb),
    ]:
        rates = {}
        for d in top:
            # the q129 points are emitted by the standalone q129 row
            # when present, else by q138's semantic stage
            c = (vols.get(d, {}).get(q, {}).get(point)
                 or vols.get(d, {}).get("q138_dedup_pipeline", {}).get(point))
            n = table.get(d)
            if c and n:
                rates[d] = c / n
        if len(rates) >= 2:
            # q34's candidates/vector legitimately grows with L(m) (the
            # declared recall price), so its check normalizes by L
            note = ""
            if q == "q34_dedup_embedding":
                rates = {d: r / geom[d]["L"] for d, r in rates.items()}
                note = "per TABLE (candidates/vector/L — L is corpus-scaled since r15)"
            vals = list(rates.values())
            spread = max(vals) / min(vals)
            checks.append({
                "engine": q, "point": point, "note": note,
                "candidates_per_row": {k: round(v, 2) for k, v in rates.items()},
                "max_over_min": round(spread, 3),
                "linear_within_1.35x": spread <= 1.35,
            })
    out["volume_linearity"] = checks

    recall = {}
    for mult in ("100x", "256x", "512x", "1024x"):
        r = maybe(f"{R15}/recall_{mult}.json")
        if r is not None:
            recall[f"at_{mult}"] = r
    out["q34_planted_recall"] = recall

    fus = maybe(f"{R15}/fusion_256x.json")
    if fus is not None:
        out["fusion_planted_eval"] = fus

    builds = {}
    for mult in ("512x", "1024x", "2048x"):
        b = maybe(f"{R15}/cellbuild_{mult}.json")
        if b is not None:
            builds[f"at_{mult}"] = b
    out["cell_build_adjudication"] = builds

    ca = maybe(f"{R15}/cell_append.json")
    if ca is not None:
        out["cell_append_premium"] = ca

    out["cell_index_build_sec"] = {
        name: col.get("cell_index_build_sec")
        for name, col in cols.items()
        if col.get("cell_index_build_sec") is not None
    }
    out["index_phases_sf0.1"] = sf01.get("index_phases", {})
    out["resources"] = {name: col.get("resources", {}) for name, col in cols.items()}

    with open("/root/repo/SCALING_r15.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_r15.json;",
          "linearity:", [(c["engine"], c["linear_within_1.35x"]) for c in checks])


NOTE = (
    "round-15 scaling: every column re-measured at round-15 HEAD in one same-host session; ALL derived "
    "corpora regenerated (r15 adds the cross-modal X/S/T planted families + the semi-join doc-twin fix, "
    "so absolute times are not directly comparable to r14 columns; volumes stay the era-independent "
    "grade, now including q129's multi-probe candidate counts). THE ROUND'S HEADLINE: both semantic-dedup "
    "routes now HOLD at scale, measured against the planted truth across four decades. q129 multi-probe "
    "(CellIndex format v4: probe-1 = the legacy assignment, probe-2 = the nearest different fine centroid "
    "among the two nearest coarse cells) lifts catch at cosine 0.95 from r14's 0.75-0.79 ceiling to "
    "0.966/0.969/0.979/0.985 at 100/256/512/1024x — the rate RISES with scale — at a candidate cost "
    "bounded by ProbeCount^2 and measured (q129_candidates/vector ~130 at 100x vs ~32 single-probe). "
    "q34's table count is corpus-scaled by the validated union law (L = smallest holding R(0.90) >= 0.9 "
    "at the corpus's own m: 14/19/23/27 at the four decades); measured planted R(0.90) = "
    "0.912/0.900/0.905/0.909 — the r14 one-plane-step-per-doubling decay is GONE, every band within "
    "binomial 2-sigma of the law, precision 1.0. The declared price is linear in L and visible in the "
    "artifact: q34 1024x wall moved 72.8 -> 159.1 s while candidates/vector/L stays flat (the linearity "
    "check normalizes per table). FUSION NOW HAS A PROBE IT CAN WIN AND WINS IT (fusion_planted_eval): "
    "against the planted cross-modal truth at 256x, lexical ranks T=1/X=2 (S invisible), semantic ranks "
    "S=1/X=2 (T invisible), fused ranks X=1 on every probe — fused MRR 1.0 vs 0.5 for each single "
    "channel, the Cormack-RRF value proposition measured positive (the probe design itself measured this "
    "corpus's BM25 as tf-of-common-tokens dominated: a 50%-overlap twin ranked ~4000/5192, hence the "
    "shared rare marker token, df=3 — the rare-term structure real re-encodings share). THE 1024x BUILD "
    "JUMP IS ADJUDICATED (cell_build_adjudication): solo fresh-JVM phase splits show 512->1024x total "
    "143.7 -> 439.4 s (3.06x for 2x data vs the N*sqrt(k) model's 2.83x) with every phase's excess "
    "attributable to spill amplification under the fixed-size JVM (mem-spill bytes 226 -> 692 GB in the "
    "fine rounds; r14's 503 s single-probe number sits ABOVE r15's 439 s multi-probe one — era/heap "
    "regime, not an algorithmic constant). COMPACTION GENERALIZED to all six persisted index families "
    "(shared Formats machinery: relative trigger so multi-split buckets never re-trigger per batch, "
    "rename-aside swap whose crash recovery is one rename; per-family compact_sec in INDEX_COSTS.json). "
    "2048x decade (4.49M vectors / 10.6M docs) probed on the pair engines, volumes-graded."
)

if __name__ == "__main__":
    main()
