#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Reads Verify.scala output (per-query parquet + oracle_sql.json), runs
each oracle SQL in DuckDB over the same testdata parquet tables, and
compares: schema (column names, sorted), row count, and values (rows
sorted, columns sorted by name, floats rounded to 6 significant-ish
decimals before hashing).

Usage: check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str) else v
            )
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_df = pd.read_parquet(qdir)
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        mismatch = None
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                ok = all(
                    (pd.isna(x) and pd.isna(y)) or (not pd.isna(x) and not pd.isna(y) and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9))
                    for x, y in zip(av.astype(float), bv.astype(float))
                )
            else:
                ok = av.astype(str).equals(bv.astype(str))
            if not ok:
                mismatch = c
                break
        if mismatch:
            print(f"[FAIL] {name}: column '{mismatch}' differs")
            print("  spark:", a.head(3).to_dict("records"))
            print("  duck :", b.head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"[pass] {name}: {len(a)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
