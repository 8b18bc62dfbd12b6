#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [query ...]

Reads each <out>/<name> parquet dump written by graft.Verify, re-runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against the sf0.01
tables, and compares: row count, sorted-column-name schema, and exact values
after sorting rows. Prints PASS/FAIL per query.
"""
import json
import sys

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    out = sys.argv[1]
    with open(f"{out}/oracle_sql.json") as f:
        oracles = json.load(f)
    # staleness guard: a failed sbt compile leaves the PREVIOUS dump in
    # place, and grep-filtered pipelines can hide that — surface any
    # dump/oracle drift instead of silently checking old results
    import os
    dumped = {d for d in os.listdir(out) if not d.endswith(".json")}
    missing_dump = set(oracles) - dumped
    if missing_dump:
        print(f"WARNING: oracle entries with NO dump (failed query or stale dump?): {sorted(missing_dump)}")
    names = sys.argv[2:] or sorted(oracles)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            spark_df = pd.read_parquet(f"{out}/{name}")
            ora_df = con.execute(oracles[name]).df()
            s, o = norm(spark_df), norm(ora_df)
            rows = len(s) == len(o)
            schema = list(s.columns) == list(o.columns)
            if rows and schema:
                # driver hashes values; emulate with exact compare on
                # stringified cells (catches float-vs-int dtype drift)
                sv = s.astype(str).values.tolist()
                ov = o.astype(str).values.tolist()
                match = sv == ov
            else:
                match = False
            status = "PASS" if (rows and schema and match) else "FAIL"
            if status == "PASS":
                n_pass += 1
            else:
                n_fail += 1
            print(f"{name}: {status} rows={len(s)}/{len(o)} schema={schema} values={match}")
            if status == "FAIL" and rows and schema:
                diff = [
                    (i, a, b)
                    for i, (a, b) in enumerate(zip(sv, ov))
                    if a != b
                ][:3]
                for i, a, b in diff:
                    print(f"  row {i}: spark={a} oracle={b}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"{name}: ERROR {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")


if __name__ == "__main__":
    main()
