#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet produced by graft.Verify plus oracle_sql.json,
runs the oracle in DuckDB against the sf tables, and compares after
sorting columns by name and rows by all columns (the driver's scheme).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"MISSING  {name}: no spark output"); fail += 1; continue
        got = canon(con.sql(f"SELECT * FROM read_parquet({spark_files!r})").df())
        want = canon(con.sql(sql).df())
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            fail += 1; continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
            fail += 1; continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                    diffs.append(c)
            else:
                if not a.astype(str).equals(b.astype(str)):
                    diffs.append(c)
        if diffs:
            print(f"VALUES   {name}: columns differ {diffs}")
            for c in diffs[:2]:
                m = got[c].astype(str) != want[c].astype(str)
                print(got[m].head(3)); print(want[m].head(3))
            fail += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            ok += 1
    # queries with no oracle: rows-only
    for name in SparkQueriesWithoutOracle(out_dir, oracles):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        n = len(con.sql(f"SELECT * FROM read_parquet({files!r})").df()) if files else 0
        print(f"{'ROWSONLY' if n > 0 else 'EMPTY!  '} {name} ({n} rows)")
        ok += 1 if n else 0
        fail += 0 if n else 1
    print(f"== {ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

def SparkQueriesWithoutOracle(out_dir, oracles):
    dirs = [d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))]
    return sorted(set(dirs) - set(oracles))

if __name__ == "__main__":
    main()
