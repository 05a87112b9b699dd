#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run each oracle SQL in
DuckDB against the sf parquet tables, load the Spark result parquet, sort
columns by name + rows by all columns, and compare values. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, json, sys, glob
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for q, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).df()
        sdf = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{out}/{q}/*.parquet")])
    except Exception as e:
        print(f"FAIL {q}: {type(e).__name__}: {e}")
        fail += 1
        continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    o, s = norm(odf), norm(sdf)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {q}: columns oracle={list(o.columns)} spark={list(s.columns)}")
        fail += 1
        continue
    if len(o) != len(s):
        print(f"FAIL {q}: rows oracle={len(o)} spark={len(s)}")
        fail += 1
        continue
    try:
        pd.testing.assert_frame_equal(o, s, check_dtype=False, check_exact=True)
        print(f"OK   {q}: {len(o)} rows")
        ok += 1
    except AssertionError as e:
        print(f"FAIL {q}: value mismatch: {str(e)[:400]}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
