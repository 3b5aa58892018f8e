#!/usr/bin/env python3
"""Determinism sweep: compare two independent Verify output dirs.

Catches the class of bug where a query's result depends on sampled
partitioning, uncached nondeterministic columns, or driver-side
iteration order (e.g. the td_pack RangePartitioner double-execution
bug): run `graft.Verify` twice into different dirs, then

    python3 tools/check_determinism.py /tmp/va /tmp/vb

Rows are compared exactly (sorted by all columns, columns sorted by
name). Queries whose outputs are LEGITIMATELY run-dependent must not
exist — every gate query is required to be deterministic.
"""
import sys, glob, os
import pandas as pd

def load(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)],
                     ignore_index=True)

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: v.tobytes() if hasattr(v, "tobytes") else v)
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)

def main(a_dir, b_dir):
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    fails = 0
    for name in names:
        a = load(os.path.join(a_dir, name))
        b = load(os.path.join(b_dir, name))
        if a is None or b is None:
            print(f"MISS {name}: a={'ok' if a is not None else 'missing'} "
                  f"b={'ok' if b is not None else 'missing'}")
            fails += 1
            continue
        if sorted(a.columns) != sorted(b.columns):
            print(f"COLS {name}: {sorted(a.columns)} vs {sorted(b.columns)}")
            fails += 1
            continue
        if len(a) != len(b):
            print(f"ROWS {name}: {len(a)} vs {len(b)}")
            fails += 1
            continue
        na, nb = norm(a), norm(b)
        if not na.equals(nb):
            diff_cols = [c for c in na.columns if not na[c].equals(nb[c])]
            print(f"DIFF {name}: cols {diff_cols}")
            fails += 1
        else:
            print(f"OK   {name}")
    print(f"== {len(names)} queries, {fails} nondeterministic ==")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
