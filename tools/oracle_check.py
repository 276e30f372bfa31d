#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Reads Verify's output dir (<out>/<query>/ parquet + oracle_sql.json), runs
each oracle SQL in DuckDB against the sf dir's parquet tables, and compares:
row count, column names (sorted), and a hash over sorted values.
Driver-side tooling only (python/duckdb/pandas are NOT used by engine code).
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(round(v, 9)))
            elif isinstance(v, (np.floating,)):
                vals.append(repr(round(float(v), 9)))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.read_parquet(f"{outdir}/{name}")
        duck_df = con.execute(sql).fetchdf()
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}"); fail += 1; continue
        hs, hd = canon(spark_df), canon(duck_df)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(spark_df)} rows)")
            m = spark_df.reindex(sorted(spark_df.columns), axis=1)
            d = duck_df.reindex(sorted(duck_df.columns), axis=1)
            print("  spark:", m.head(3).to_dict("records"))
            print("  duck :", d.head(3).to_dict("records"))
            fail += 1; continue
        print(f"OK   {name}: {len(spark_df)} rows"); ok += 1
    except Exception as e:
        print(f"ERR  {name}: {e}"); fail += 1

# rows-only queries (no oracle)
import os
for d in sorted(os.listdir(outdir)):
    if d in oracle or d == "oracle_sql.json":
        continue
    try:
        n = len(pd.read_parquet(f"{outdir}/{d}"))
        print(f"ROWS {d}: {n} rows{' (EMPTY!)' if n == 0 else ''}")
    except Exception as e:
        print(f"ERR  {d}: {e}")

print(f"\n{ok} ok, {fail} fail of {len(oracle)} oracle queries")
sys.exit(1 if fail else 0)
