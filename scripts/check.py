#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run Verify output
parquet vs DuckDB oracle SQL on the same testdata, compare row/schema/values.
Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(f).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
failed = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no result dir"); failed += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
        want = con.sql(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); failed += 1; continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        failed += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); failed += 1; continue
    # stringify (like a hash would) and compare cell-wise
    gs, ws = got.astype(str), want.astype(str)
    if not gs.equals(ws):
        diff = (gs != ws).any(axis=1)
        print(f"FAIL {name}: {diff.sum()} differing rows; first:")
        print("  got :", gs[diff].iloc[0].to_dict())
        print("  want:", ws[diff].iloc[0].to_dict())
        failed += 1; continue
    print(f"OK   {name}: {len(got)} rows")
# queries without oracle → rows-only
print(f"\n{failed} failures / {len(oracle)} oracle queries")
sys.exit(1 if failed else 0)
