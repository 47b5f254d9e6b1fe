#!/usr/bin/env python3
"""Merge a duckdb_anchor.py run with graft bench numbers into the
round's DUCKDB_ANCHOR artifact shape (the r12 format: per-query
duckdb/graft median+min plus the time-weighted total ratio).

Usage: merge_anchor.py <duckdb_anchor_json> <bench_json> [carry_json]
  <duckdb_anchor_json>: output of scripts/duckdb_anchor.py
  <bench_json>: graft Bench output (bench_out.json or _partial)
  [carry_json]: optional prior DUCKDB_ANCHOR_r{N}.json whose query rows
                are carried over for queries NOT re-measured this run.
Prints the merged artifact JSON to stdout (caller adds "what" context).
Driver-side tooling only, like check.py — never a library dep.
"""
import json
import sys


def main() -> None:
    anchor = json.load(open(sys.argv[1]))
    bench = json.load(open(sys.argv[2]))
    carry = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else None

    queries = {}
    if carry:
        # rows inherited from a prior round are LABELLED as such so a
        # published artifact never passes off last round's timings as
        # this round's measurements
        for name, row in carry["queries"].items():
            queries[name] = dict(row, carried=True)
    for name, d in anchor["queries"].items():
        gm = bench["queries"].get(name)
        gn = bench.get("queries_min", {}).get(name)
        if gm is None:
            kept = ("prior-round row KEPT (fresh duckdb measurement "
                    "DISCARDED)" if name in queries else "row DROPPED")
            print(f"WARNING: no graft bench number for {name}; {kept} — "
                  "re-run Bench with this query included",
                  file=sys.stderr)
            continue
        queries[name] = {
            "duckdb_median_s": d["median_s"],
            "duckdb_min_s": d["min_s"],
            "graft_median_s": round(gm, 4),
            "graft_min_s": round(gn, 4) if gn is not None else None,
            "graft_over_duckdb": round(gm / d["median_s"], 2),
        }

    gt = sum(q["graft_median_s"] for q in queries.values())
    dt = sum(q["duckdb_median_s"] for q in queries.values())
    # the headline ratio must state how much of it is inherited: list the
    # carried rows at the top level and publish a second ratio over the
    # fresh-only rows, so a mixed-round blend can never masquerade as a
    # single-session measurement
    carried = sorted(n for n, q in queries.items() if q.get("carried"))
    fresh = {n: q for n, q in queries.items() if not q.get("carried")}
    fg = sum(q["graft_median_s"] for q in fresh.values())
    fd = sum(q["duckdb_median_s"] for q in fresh.values())
    print(json.dumps({
        "sf_dir": anchor["sf_dir"],
        "duckdb_version": anchor["version"],
        "threads": anchor["threads"],
        "duckdb_reps": anchor["reps"],
        "time_weighted_graft_over_duckdb": round(gt / dt, 3),
        "graft_total_s": round(gt, 1),
        "duckdb_total_s": round(dt, 1),
        "carried_queries": carried,
        "fresh_graft_over_duckdb": round(fg / fd, 3) if fd else None,
        "fresh_graft_total_s": round(fg, 1),
        "fresh_duckdb_total_s": round(fd, 1),
        "queries": queries,
    }, indent=1))


if __name__ == "__main__":
    main()
