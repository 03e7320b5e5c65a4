#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (t2 gate).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the registered oracle SQL in DuckDB over the same tables, sort
columns by name, sort rows, and compare values exactly (with a
float tolerance fallback reported separately so we can see HOW close a
mismatch is).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def load_spark(name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

results = {}
names = sorted(set(list(oracle.keys()) +
                   [os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(d)]))
for name in names:
    s = load_spark(name)
    if s is None:
        results[name] = "NO_SPARK_OUTPUT"
        continue
    if name not in oracle:
        results[name] = f"no_oracle (rows={len(s)})"
        continue
    try:
        o = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    s, o = canon(s), canon(o)
    if list(s.columns) != list(o.columns):
        results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"
        continue
    if len(s) != len(o):
        results[name] = f"ROWS_MISMATCH spark={len(s)} oracle={len(o)}"
        continue
    dtype_notes = []
    for c in s.columns:
        if s[c].dtype != o[c].dtype:
            dtype_notes.append(f"{c}: {s[c].dtype} vs {o[c].dtype}")
    exact = True
    close = True
    bad = []
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            eq = np.isclose(sv.astype(float), ov.astype(float),
                            rtol=0, atol=0, equal_nan=True)
            cl = np.isclose(sv.astype(float), ov.astype(float),
                            rtol=1e-9, atol=1e-9, equal_nan=True)
        elif sv.dtype.kind == "M" or ov.dtype.kind == "M":
            eq = cl = (pd.to_datetime(sv).values == pd.to_datetime(ov).values)
        else:
            eq = cl = (sv.astype(str).values == ov.astype(str).values)
        if not np.all(eq):
            exact = False
            i = int(np.argmin(eq))
            bad.append(f"{c}[row{i}]: {sv.iloc[i]!r} vs {ov.iloc[i]!r} ({(~eq).sum()} diffs)")
        if not np.all(cl):
            close = False
    tag = "EXACT" if exact else ("CLOSE" if close else "DIFF")
    note = ("; dtypes: " + ", ".join(dtype_notes)) if dtype_notes else ""
    detail = ("; " + " | ".join(bad[:3])) if bad else ""
    results[name] = f"{tag} rows={len(s)}{note}{detail}"

if not results:
    print("no queries found (empty dump dir and oracle_sql.json?)")
    sys.exit(1)
width = max(len(n) for n in results)
n_pass = sum(1 for v in results.values() if v.startswith("EXACT"))
for n, v in sorted(results.items()):
    print(f"{n:<{width}}  {v}")
print(f"\n{n_pass}/{len([n for n in results if n in oracle])} oracle queries EXACT")
