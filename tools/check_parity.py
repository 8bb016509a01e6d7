#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_parity.py [sfdir] [outdir]
Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran (or run
with --run to invoke it). Compares each <outdir>/<name> parquet against
DuckDB executing oracle_sql.json[name] on views named after the tables.
Comparison: columns sorted by name, rows sorted, exact value equality
(floats must match to the bit after each engine's own round()).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(f"{outdir}/{name}/*.parquet")
        if not pq:
            print(f"FAIL {name}: no spark output parquet"); n_bad += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(pq)]))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duckdb={list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(want)}"); n_bad += 1; continue
        diffs = []
        for c in got.columns:
            a, b = got[c].values, want[c].values
            if pd.api.types.is_float_dtype(got[c]):
                neq = ~((a == b) | (pd.isna(a) & pd.isna(b)))
                if neq.any():
                    i = int(np.argmax(neq))
                    diffs.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r} (maxabs {np.nanmax(np.abs(a-b)):.3e})")
            else:
                eq = (pd.Series(a).astype(object).where(~pd.isna(a), None) ==
                      pd.Series(b).astype(object).where(~pd.isna(b), None)) | (pd.isna(a) & pd.isna(b))
                if not eq.all():
                    i = int(np.argmax(~eq.values))
                    diffs.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r}")
        if diffs:
            print(f"FAIL {name}: " + " | ".join(diffs[:4])); n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows, {len(got.columns)} cols)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(oracle)} total")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
