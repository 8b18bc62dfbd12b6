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
    # own JVM (a1, AQE_INITIAL_FACTOR=64 for the SHJ conversion) with
    # q129/q138 in a2; absent suffixes are simply skipped.
    parts = ["a", "a1", "a2", "b", "c"]
    merged = None
    missing = []
    for p in parts:
        f = f"{R16}/bench_2048x_{p}.json"
        if not os.path.exists(f):
            missing.append(f"part {p}: file missing")
            continue
        with open(f) as fh:
            d = json.load(fh)
        for q, err in (d.get("failed") or {}).items():
            missing.append(f"part {p}: {q} FAILED: {err[:120]}")
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
    if missing:
        merged["parts_missing"] = missing
        for m in missing:
            print(f"[merge] HOLE: {m}", file=sys.stderr)
    # n_failed must be the UNION across parts, not whatever the first part
    # carried (r16 shipped n_failed=1 while `failed` held two entries).
    merged["n_failed"] = len(merged.get("failed") or {})
    merged["passes"] = 1
    merged["note"] = ("merged from per-engine JVM runs (a=q34/q129/q138 + cell build, b=q118, c=q32), "
                      "single pass — the decade bracket matters more than the min-of-2 noise floor "
                      "under the round deadline")
    with open(f"{R16}/bench_2048x.json", "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"[merge] wrote bench_2048x.json; queries: {sorted((merged.get('queries') or {}).keys())}")


if __name__ == "__main__":
    main()
