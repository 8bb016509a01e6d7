#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle hash compare.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle_sql.json SQL in DuckDB against <sfDir>/*.parquet, sorts columns by
name, and compares row-by-row (with float tolerance awareness: exact string
compare after canonical formatting, mirroring a hash-match).
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

fails = 0
for name, sql in sorted(oracle.items()):
    spark_glob = os.path.join(out_dir, name, "*.parquet")
    files = glob.glob(spark_glob)
    if not files:
        print(f"MISSING  {name}: no spark result parquet")
        fails += 1
        continue
    try:
        duck = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fails += 1
        continue
    spark = con.execute(
        f"SELECT * FROM read_parquet('{spark_glob}')").fetchdf()
    duck = duck.reindex(sorted(duck.columns), axis=1)
    spark = spark.reindex(sorted(spark.columns), axis=1)
    if list(duck.columns) != list(spark.columns):
        print(f"SCHEMA   {name}: duck={list(duck.columns)} spark={list(spark.columns)}")
        fails += 1
        continue
    if len(duck) != len(spark):
        print(f"ROWS     {name}: duck={len(duck)} spark={len(spark)}")
        fails += 1
        continue
    # canonical string form per cell, like a hash compare; nulls collapse
    # to one sentinel (None vs NaN differ between the two frames) and
    # floats format at .17g — the shortest form that round-trips every
    # IEEE double bit-exactly, so a 1-ulp cross-engine divergence FAILS
    # here exactly as it fails the driver's hash
    import pandas as pd
    def canon(df):
        rows = []
        for c in df.columns:
            col = df[c]
            if pd.api.types.is_float_dtype(col):
                rows.append([("<NULL>" if pd.isna(v) else format(v, ".17g"))
                             for v in col])
            else:
                rows.append([("<NULL>" if (v is None or (isinstance(v, float) and pd.isna(v)))
                              else str(v)) for v in col])
        return [list(t) for t in zip(*rows)] if rows else []
    ds = canon(duck)
    ss = canon(spark)
    if ds != ss:
        bad = next(i for i, (a, b) in enumerate(zip(ds, ss)) if a != b)
        print(f"HASH     {name}: first diff row {bad}:\n  duck : {ds[bad]}\n  spark: {ss[bad]}")
        fails += 1
        continue
    print(f"OK       {name} ({len(duck)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
