#!/usr/bin/env python3
"""Per-query timing profile of the DuckDB oracle suite.

Usage: python3 tools/oracle_profile.py <sfDir> <verifyOutDir> [out.json]

Times each oracle SQL (DuckDB execute+fetch) and each Spark-parquet load
separately, so the gate's wall-clock budget can be attributed per query.
Builder-side tooling only.
"""
import sys, json, glob, os, time
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
out_json = sys.argv[3] if len(sys.argv) > 3 else "/tmp/oracle_profile.json"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

rows = []
t_all0 = time.monotonic()
for name in sorted(oracle):
    t0 = time.monotonic()
    err = None
    try:
        con.execute(oracle[name]).fetchdf()
    except Exception as e:
        err = str(e)[:120]
    t_duck = time.monotonic() - t0
    t0 = time.monotonic()
    n = 0
    path = os.path.join(out_dir, name)
    if os.path.isdir(path):
        for f in glob.glob(f"{path}/*.parquet"):
            n += len(pd.read_parquet(f))
    t_load = time.monotonic() - t0
    rows.append({"name": name, "duck_sec": round(t_duck, 3),
                 "load_sec": round(t_load, 3), "rows": n, "err": err})
total = time.monotonic() - t_all0

rows.sort(key=lambda r: -r["duck_sec"])
print(f"TOTAL {total:.1f}s  duck={sum(r['duck_sec'] for r in rows):.1f}s "
      f"load={sum(r['load_sec'] for r in rows):.1f}s  n={len(rows)}")
print(f"{'query':34s} {'duck_s':>8s} {'load_s':>8s} {'rows':>8s}")
for r in rows[:40]:
    print(f"{r['name']:34s} {r['duck_sec']:8.2f} {r['load_sec']:8.2f} "
          f"{r['rows']:8d} {r['err'] or ''}")
json.dump({"total_sec": round(total, 1), "queries": rows},
          open(out_json, "w"), indent=1)
print(f"wrote {out_json}")
