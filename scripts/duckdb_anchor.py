#!/usr/bin/env python3
"""Absolute bench anchor: time DuckDB itself on the most expensive oracle
queries at a given SF, for comparison against graft's Bench numbers on the
SAME queries over the SAME parquet.

NOT a gate — DuckDB is a single-node vectorized OLAP engine executing the
hand-written oracle SQL, graft is a distributed engine paying Spark's
planning/shuffle/JVM overheads for plans that survive a 1000-executor
cluster; the comparison anchors the absolute cost of the workload, it does
not rank the engines. BASELINE.json defines a relative metric but publishes
no timings, so this is the round's stand-in for an absolute reference.

Usage: duckdb_anchor.py <sf_dir> <verify_out_dir> <q1,q2,...> [reps]
  <verify_out_dir> must contain oracle_sql.json (graft.Verify writes it).
Prints one JSON object with per-query median/min seconds.
Driver-side tooling only (duckdb), like check.py — never a library dep.
"""
import glob
import json
import os
import statistics
import sys
import time

import duckdb

sfdir, vout, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5

oracle = json.load(open(os.path.join(vout, "oracle_sql.json")))
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    t = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

out = {}
for name in names:
    sql = oracle[name]
    con.execute(sql).fetchall()  # warmup (plan cache, file footers, OS cache)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()  # full materialization, like Bench's noop sink
        times.append(time.perf_counter() - t0)
    out[name] = {
        "median_s": round(statistics.median(times), 4),
        "min_s": round(min(times), 4),
    }

print(json.dumps({
    "engine": "duckdb",
    "version": duckdb.__version__,
    "threads": con.execute("SELECT current_setting('threads')").fetchone()[0],
    "sf_dir": sfdir,
    "reps": reps,
    "queries": out,
}))
