#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run graft.Verify output against the
DuckDB oracle and diff values + dtypes. Dev tool only — the shipped engine is
pure Scala/Spark; this uses the driver-side python stack (duckdb/pandas).

Usage: python3 scripts/check_correctness.py [sfDir] [verifyOutDir]
"""
import sys, json, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


n_pass = n_fail = 0
for name in sorted(oracle):
    try:
        got = canon(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df())
        want = canon(con.sql(oracle[name]).df())
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"columns got={list(got.columns)} want={list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows got={len(got)} want={len(want)}")
        else:
            for c in got.columns:
                if str(got[c].dtype) != str(want[c].dtype):
                    problems.append(f"dtype[{c}] got={got[c].dtype} want={want[c].dtype}")
                eq = (got[c] == want[c]) | (got[c].isna() & want[c].isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    problems.append(
                        f"value[{c}] row {i}: got={got[c][i]!r} want={want[c][i]!r} "
                        f"({int((~eq).sum())} diffs)")
        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems[:6]:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"ok   {name} ({len(got)} rows)")
    except Exception as e:
        n_fail += 1
        print(f"FAIL {name}: {type(e).__name__}: {e}")

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
