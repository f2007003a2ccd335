#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: run its oracle SQL (from
oracle_sql.json) in DuckDB over the sfDir parquet tables, load the Spark
parquet output, sort rows, sort columns by name, and compare values.
This is a builder-side tool only (driver-side python is allowed for
tooling; the engine itself is pure Scala Spark).
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(eq(x, y) for x, y in zip(la, lb))
    return str(a) == str(b)

fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{path}/*.parquet")],
        ignore_index=True)
    if name not in oracle:
        skips.append(f"{name}: rows-only ({len(spark_df)} rows)")
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append(f"{name}: ORACLE SQL ERROR {e}")
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        fails.append(f"{name}: COLS spark={list(a.columns)} duck={list(b.columns)}")
        continue
    if len(a) != len(b):
        fails.append(f"{name}: ROWS spark={len(a)} duck={len(b)}")
        continue
    bad = None
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn or not eq(x, y):
                bad = f"{name}: VALUE col={c} row={i} spark={x!r} duck={y!r}"
                break
        if bad:
            break
    if bad:
        fails.append(bad)
    else:
        passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"SKIP (rows-only) {len(skips)}:")
for s in skips:
    print("  ", s)
print(f"FAIL {len(fails)}:")
for f in fails:
    print("  ", f)
sys.exit(1 if fails else 0)
