#!/usr/bin/env python3
"""Snapshot a derived corpus's documents/embeddings row counts into the
campaign's corpus_rows.json — taken at GENERATION time so mid-campaign
corpus deletion (the 2048x disk-headroom discipline) cannot lose the
denominators the scaling artifact normalizes by.

Usage: snapshot_rows.py <decade_key> <corpus_dir> <out_json>
"""
import glob
import json
import os
import sys

import pyarrow.parquet as pq


def rows(path):
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(os.path.join(path, "*.parquet")))


def main():
    key, d, out = sys.argv[1], sys.argv[2], sys.argv[3]
    snap = {"documents": {}, "embeddings": {}}
    if os.path.exists(out):
        with open(out) as f:
            snap = json.load(f)
    n_doc = rows(os.path.join(d, "documents.parquet"))
    n_emb = rows(os.path.join(d, "embeddings.parquet"))
    if n_doc <= 0 or n_emb <= 0:
        print(f"[snapshot] EMPTY corpus at {d} (docs={n_doc}, emb={n_emb})", file=sys.stderr)
        sys.exit(1)
    snap["documents"][key] = n_doc
    snap["embeddings"][key] = n_emb
    with open(out, "w") as f:
        json.dump(snap, f, indent=1)
    print(f"[snapshot] {key}: documents={n_doc} embeddings={n_emb}")


if __name__ == "__main__":
    main()
