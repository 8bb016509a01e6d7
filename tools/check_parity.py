#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle hash compare.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir> [--types-only]

Loads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle_sql.json SQL in DuckDB against <sfDir>/*.parquet, compares column
TYPES (DuckDB DESCRIBE of oracle vs of the Spark parquet — a HUGEINT-vs-
BIGINT divergence fails here the way it fails the driver's typed hash),
then sorts columns by name and compares row-by-row (exact string compare
after canonical formatting, mirroring a hash-match).

--types-only: audit every oracle's DESCRIBE'd column types against the
portable set without needing Spark results — <verifyOutDir> may then be a
path to an oracle_sql.json file instead of a Verify output directory.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
types_only = "--types-only" in sys.argv[3:]
oracle_path = out_dir if out_dir.endswith(".json") \
    else os.path.join(out_dir, "oracle_sql.json")
oracle = json.load(open(oracle_path))

con = duckdb.connect()
for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

# DuckDB types the driver's typed hash treats as interchangeable:
# Spark parquet timestamps read back WITH TIME ZONE while the oracle's
# window/date functions yield plain TIMESTAMP — the driver hashes the
# same instants either way.
def norm_type(t):
    return t.upper().replace(" WITH TIME ZONE", "")

# Oracle column types that can never agree with a Spark parquet result:
# DuckDB sum(BIGINT) silently widens to HUGEINT (int128), which Spark
# cannot emit — that exact widening hid q71's hash-fail for two rounds.
NON_PORTABLE = ("HUGEINT", "UHUGEINT")

def types_of(query):
    rows = con.execute(f"DESCRIBE {query}").fetchall()
    return {r[0]: norm_type(r[1]) for r in rows}

if types_only:
    # portable = types both engines emit identically through parquet;
    # anything else (HUGEINT from an uncast sum(), DECIMAL from avg over
    # decimals) is a latent typed-hash divergence even when values match
    PORTABLE = {"BIGINT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP",
                "BOOLEAN", "INTEGER"}
    def portable(t):
        # arrays are portable iff their ELEMENT type is (a HUGEINT[] is
        # just as much a latent typed-hash divergence as a bare HUGEINT)
        while t.endswith("[]"):
            t = t[:-2]
        return t in PORTABLE
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            off = {c: t for c, t in types_of(sql).items()
                   if not portable(t)}
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            bad += 1
            continue
        if off:
            print(f"NONPORT  {name}: {off}")
            bad += 1
        else:
            print(f"OK       {name}")
    print(f"\n{len(oracle) - bad}/{len(oracle)} oracles fully portable")
    sys.exit(1 if bad else 0)

fails = 0
for name, sql in sorted(oracle.items()):
    spark_glob = os.path.join(out_dir, name, "*.parquet")
    files = glob.glob(spark_glob)
    if not files:
        print(f"MISSING  {name}: no spark result parquet")
        fails += 1
        continue
    try:
        duck_types = types_of(sql)
        duck = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fails += 1
        continue
    spark_sel = f"SELECT * FROM read_parquet('{spark_glob}')"
    spark_types = types_of(spark_sel)
    spark = con.execute(spark_sel).fetchdf()
    duck = duck.reindex(sorted(duck.columns), axis=1)
    spark = spark.reindex(sorted(spark.columns), axis=1)
    if list(duck.columns) != list(spark.columns):
        print(f"SCHEMA   {name}: duck={list(duck.columns)} spark={list(spark.columns)}")
        fails += 1
        continue
    # column-TYPE compare before the value compare: pandas stringification
    # below prints HUGEINT 70 and BIGINT 70 identically, but the driver's
    # typed hash diverges — this is the check that makes that reproduce
    # locally (masked q71 for two rounds)
    bad_types = {c: (duck_types[c], spark_types[c]) for c in duck.columns
                 if duck_types.get(c) != spark_types.get(c)}
    if bad_types:
        print(f"TYPE     {name}: oracle vs spark column types differ: {bad_types}")
        fails += 1
        continue
    hugeint = [c for c, t in duck_types.items()
               if any(p in t for p in NON_PORTABLE)]
    if hugeint:
        print(f"PORTAB   {name}: oracle columns {hugeint} are int128 — cast to ::BIGINT")
        fails += 1
        continue
    if len(duck) != len(spark):
        print(f"ROWS     {name}: duck={len(duck)} spark={len(spark)}")
        fails += 1
        continue
    # canonical string form per cell, like a hash compare; nulls collapse
    # to one sentinel (None vs NaN differ between the two frames) and
    # floats format at .17g — a fixed 17-significant-digit form that
    # round-trips every IEEE double bit-exactly, so a 1-ulp cross-engine
    # divergence FAILS here exactly as it fails the driver's hash
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
