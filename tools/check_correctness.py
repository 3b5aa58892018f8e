#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
tables, and compares values with columns sorted by name and rows sorted
by all columns. Floats compared to 1e-9 relative tolerance first, then
exact-after-round to flag borderline cases.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, a, b):
    if a is None:
        return f"{name}: MISSING spark output"
    if list(sorted(a.columns)) != list(sorted(b.columns)):
        return f"{name}: COLUMNS spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"{name}: ROWS spark={len(a)} oracle={len(b)}"
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            close = np.isclose(af, bf, rtol=1e-9, atol=1e-9) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                return f"{name}: VALUE col={c} row={i} spark={af[i]} oracle={bf[i]}"
            exact = (af == bf) | both_nan
            if not exact.all():
                i = int(np.argmin(exact))
                return f"{name}: NEAR col={c} row={i} spark={af[i]!r} oracle={bf[i]!r} (tolerance-only match)"
        else:
            eq = (av.to_numpy() == bv.to_numpy()) | (av.isna() & b[c].isna()).to_numpy()
            if not eq.all():
                i = int(np.argmin(eq))
                return f"{name}: VALUE col={c} row={i} spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    for name in names:
        spark_df = load_spark(os.path.join(out_dir, name))
        if name not in oracle:
            results[name] = f"rows-only: {0 if spark_df is None else len(spark_df)} rows"
            continue
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as ex:
            results[name] = f"ORACLE-SQL-ERROR: {ex}"
            continue
        err = compare(name, spark_df, odf)
        results[name] = err or "OK"
    width = max(len(n) for n in results) if results else 10
    fails = 0
    for n, r in sorted(results.items()):
        flag = "PASS" if r == "OK" or r.startswith("rows-only") else "FAIL"
        if flag == "FAIL":
            fails += 1
        print(f"{flag} {n:<{width}} {r}")
    for n in oracle:
        if n not in results:
            print(f"FAIL {n:<{width}} oracle present but no spark output dir")
            fails += 1
    print(f"== {len(results)} queries, {fails} failures ==")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
