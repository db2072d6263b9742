#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes per-query parquet + oracle_sql.json), then this script compares
each Spark result against DuckDB running the oracle SQL over the same
source tables. Exact value comparison after sorting columns by name and
rows by all columns — strictest plausible interpretation of the gate.

Usage: python3 scripts/check.py [sf_dir] [verify_out]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    out_dirs = {d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))}
    for name in sorted(out_dirs | set(oracle)):
        path = os.path.join(out, name)
        if not os.path.isdir(path):
            print(f"{name:28s} MISSING-OUTPUT (query failed in Verify)")
            n_bad += 1
            continue
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            print(f"{name:28s} NO-OUTPUT"); n_bad += 1; continue
        spark_df = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')").df()
        if name not in oracle:
            print(f"{name:28s} rows-only rows={len(spark_df)}")
            n_ok += 1
            continue
        try:
            ora = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERROR {e}"); n_bad += 1; continue
        a, b = norm(spark_df), norm(ora)
        if list(a.columns) != list(b.columns):
            print(f"{name:28s} SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}")
            n_bad += 1; continue
        if list(a.dtypes) != list(b.dtypes):
            print(f"{name:28s} DTYPES spark={list(a.dtypes)} oracle={list(b.dtypes)}")
            # keep going — value compare may still pass via equals
        if len(a) != len(b):
            print(f"{name:28s} ROWS spark={len(a)} oracle={len(b)}"); n_bad += 1; continue
        if a.equals(b):
            print(f"{name:28s} OK rows={len(a)}"); n_ok += 1
        else:
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"{name:28s} VALUES differ in {bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"    {c}[{i}]: spark={a[c][i]!r} oracle={b[c][i]!r}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
