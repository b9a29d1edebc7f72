#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and hash-compare against the Verify
parquet dumps (columns sorted by name, rows sorted, values hashed)."""
import sys, os, glob, json, hashlib
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

con = duckdb.connect()
for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    return hashlib.md5(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

ok = bad = 0
for name in sorted(oracle):
    res_dir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(res_dir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        bad += 1
        continue
    try:
        spark_df = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        ora_df = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        bad += 1
        continue
    schema_ok = list(spark_df.columns) == list(ora_df.columns)
    rows_ok = len(spark_df) == len(ora_df)
    hash_ok = schema_ok and rows_ok and h(spark_df) == h(ora_df)
    if hash_ok:
        print(f"OK   {name}: rows={len(spark_df)}")
        ok += 1
    else:
        print(f"FAIL {name}: schema_ok={schema_ok} rows {len(spark_df)} vs {len(ora_df)} hash_ok={hash_ok}")
        if schema_ok and rows_ok:
            import pandas as pd
            neq = (spark_df != ora_df) & ~(spark_df.isna() & ora_df.isna())
            cols = [c for c in spark_df.columns if neq[c].any()]
            print(f"     differing cols: {cols}")
            for c in cols[:3]:
                i = neq[c].idxmax()
                print(f"     {c}[{i}]: spark={spark_df[c][i]!r} oracle={ora_df[c][i]!r}")
        else:
            print(f"     spark cols: {list(spark_df.columns)}")
            print(f"     ora   cols: {list(ora_df.columns)}")
        bad += 1
print(f"\n{ok} ok, {bad} fail")
sys.exit(1 if bad else 0)
