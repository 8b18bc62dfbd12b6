#!/usr/bin/env python3
"""Merge the split 2048x bench parts (a=q34/q129/q138, b=q118, c=q32 —
run as separate JVMs so one engine's death cannot lose the others'
numbers, the r15 single-run ENOSPC lesson) into one bench_2048x.json
with the same shape the assembler reads. Parts that are missing or
contain only failures are SKIPPED with a loud note — the merged file
carries `parts_missing` so the artifact can't silently claim them.
"""
import json
import os
import sys

R16 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r17"


def main():
    # r16 parts: a=q34/q129/q138, b=q118, c=q32. r17 splits q34 into its
    # own JVM (a1, AQE_INITIAL_FACTOR=128 so the decade pair-join shuffle
    # splits fine enough for in-memory sorts) with q129/q138 in a2. The
    # suffixes are alternative splits of the same engine set, so a file-
    # level "part a missing" label next to a present a1/a2 reads as data
    # loss (r17 verdict minor #5): report holes at the QUERY level — a
    # query is missing only if NO part carried it.
    part_queries = {
        "a": ["q34_dedup_embedding", "q129_semantic_dedup", "q138_dedup_pipeline"],
        "a1": ["q34_dedup_embedding"],
        "a2": ["q129_semantic_dedup", "q138_dedup_pipeline"],
        "b": ["q118_phash_neardup"],
        "c": ["q32_dedup_minhash_lsh"],
    }
    merged = None
    missing = []
    seen_parts = []
    for p in part_queries:
        f = f"{R16}/bench_2048x_{p}.json"
        if not os.path.exists(f):
            continue
        seen_parts.append(p)
        with open(f) as fh:
            d = json.load(fh)
        for q, err in (d.get("failed") or {}).items():
            missing.append(f"{q} FAILED (part {p}): {err[:120]}")
        if merged is None:
            merged = d
        else:
            for k in ("queries", "queries_pass1", "queries_pass2", "volumes", "resources", "failed"):
                if isinstance(d.get(k), dict):
                    merged.setdefault(k, {}).update(d[k])
            if d.get("cell_index_build_sec") is not None and merged.get("cell_index_build_sec") is None:
                merged["cell_index_build_sec"] = d["cell_index_build_sec"]
    if merged is None:
        print("[merge] NO parts found — not writing bench_2048x.json", file=sys.stderr)
        sys.exit(1)
    expected = sorted({q for p in seen_parts for q in part_queries[p]} |
                      {q for qs in part_queries.values() for q in qs})
    for q in expected:
        if q not in (merged.get("queries") or {}) and not any(q in m for m in missing):
            missing.append(f"{q}: not measured by any part")
    if missing:
        merged["parts_missing"] = missing
        for m in missing:
            print(f"[merge] HOLE: {m}", file=sys.stderr)
    # n_failed must be the UNION across parts, not whatever the first part
    # carried (r16 shipped n_failed=1 while `failed` held two entries).
    merged["n_failed"] = len(merged.get("failed") or {})
    merged["passes"] = 1
    merged["note"] = (f"merged from per-engine JVM runs (parts present: {','.join(seen_parts)}; "
                      "a1=q34, a2=q129/q138 + cell build, b=q118, c=q32), single pass — the decade "
                      "bracket matters more than the min-of-2 noise floor under the round deadline")
    with open(f"{R16}/bench_2048x.json", "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"[merge] wrote bench_2048x.json; queries: {sorted((merged.get('queries') or {}).keys())}")


if __name__ == "__main__":
    main()
