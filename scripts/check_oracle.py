#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle against the sf
parquet tables in DuckDB, loads the Spark dump from
<verifyOutDir>/<name>/, sorts columns by name and rows by all columns,
and reports rows/schema/hash-style equality (exact match on values
after normalizing dtypes).
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        files = glob.glob(f"{sf_dir}/{t}.parquet")
        if files:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{files[0]}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"{name}: NO SPARK DUMP")
            n_fail += 1
            continue
        try:
            odf = norm(con.execute(sql).fetchdf())
            sdf = norm(pd.concat([pd.read_parquet(f) for f in spark_files]))
        except Exception as e:
            print(f"{name}: ERROR {e}")
            n_fail += 1
            continue
        rows = len(odf) == len(sdf)
        schema = list(odf.columns) == list(sdf.columns)
        if rows and schema:
            try:
                pd.testing.assert_frame_equal(
                    sdf.astype(str), odf.astype(str), check_dtype=False)
                ok = True
            except AssertionError as e:
                ok = False
                detail = str(e).split("\n")[0:4]
        else:
            ok = False
            detail = [f"rows spark={len(sdf)} oracle={len(odf)}",
                      f"cols spark={list(sdf.columns)} oracle={list(odf.columns)}"]
        if ok:
            print(f"{name}: PASS ({len(sdf)} rows)")
            n_pass += 1
        else:
            print(f"{name}: FAIL " + " | ".join(detail))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main()
