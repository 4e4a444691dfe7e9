#!/usr/bin/env python3
"""Dev-side stand-in for the driver's correctness gate: compare Verify's
parquet dumps against the oracle SQL run in DuckDB on the same fixture dir.

Usage: python3 tools/dev_compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys
import duckdb
import pandas as pd
from pathlib import Path

sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fail = 0
for name in (names or sorted(oracle)):
    if name not in oracle:
        print(f"{name}: NO ORACLE (rows-only check)")
        continue
    spark_df = pd.read_parquet(f"{out_dir}/{name}")
    duck_df = con.execute(oracle[name]).df()
    s, o = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(o.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(s.columns)} duck={list(o.columns)}")
        fail += 1
        continue
    if len(s) != len(o):
        print(f"{name}: ROWS MISMATCH spark={len(s)} duck={len(o)}")
        fail += 1
        continue
    # dtype-tolerant value compare (the driver hashes canonical values)
    diffs = []
    for c in s.columns:
        a, b = s[c], o[c]
        try:
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                ok = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                ok = (a.astype(str) == b.astype(str)).all()
        except Exception as e:
            ok = False
        if not ok:
            diffs.append(c)
    if diffs:
        print(f"{name}: VALUE MISMATCH in {diffs}")
        for c in diffs[:2]:
            m = s[c].astype(str) != o[c].astype(str)
            print(s[m].head(3))
            print(o[m].head(3))
        fail += 1
    else:
        print(f"{name}: OK ({len(s)} rows)")
sys.exit(1 if fail else 0)
