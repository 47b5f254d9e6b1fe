#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify output vs DuckDB.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir>

For each <name>.parquet under verify_out_dir, runs oracle_sql.json[name] in
DuckDB over the sf_dir parquet tables, sorts columns by name, and compares
row count, schema (column names), and a value hash — same shape as
CORRECTNESS_r{N}.json.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # The driver's comparator sorts RAW values, so a list/array-valued
    # column crashes it (TypeError: unhashable type: 'numpy.ndarray' —
    # the embed_sq failure in CORRECTNESS_r11). Reproduce that failure
    # mode here instead of silently stringifying, so a query the driver
    # cannot compare can never look green locally. Serialize arrays to
    # strings in the query itself (concat_ws / array_to_string — the
    # pq_code precedent).
    import numpy as np
    for c in df.columns:
        if df[c].map(lambda x: isinstance(x, (list, np.ndarray))).any():
            raise TypeError(
                f"unhashable array column {c!r} — the driver comparator "
                "crashes on this; serialize it in the query (pq_code "
                "precedent)")
    # normalize dtypes: everything to string with float rounding
    out = pd.DataFrame()
    import datetime

    def tostr(x):
        if x is None or (isinstance(x, float) and pd.isna(x)):
            return "null"
        if isinstance(x, pd.Timestamp) or isinstance(x, datetime.datetime):
            if (x.hour, x.minute, x.second) == (0, 0, 0):
                return x.strftime("%Y-%m-%d")
            return x.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(x, datetime.date):
            return x.strftime("%Y-%m-%d")
        return str(x)

    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.round(6).map(lambda x: "null" if pd.isna(x) else f"{x:.6f}")
        else:
            out[c] = s.map(tostr)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name in sorted(oracle):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            results[name] = {"err": "no spark output"}
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
                ignore_index=True)
            ora_df = con.execute(oracle[name]).fetchdf()
            s, o = norm(spark_df), norm(ora_df)
            results[name] = {
                "rows_match": len(s) == len(o),
                "schema_match": list(s.columns) == list(o.columns),
                "hash_match": h(s) == h(o),
                "spark_rows": len(s), "oracle_rows": len(o), "err": None,
            }
            if not results[name]["hash_match"]:
                results[name]["spark_cols"] = list(s.columns)
                results[name]["oracle_cols"] = list(o.columns)
        except Exception as e:
            results[name] = {"err": f"{type(e).__name__}: {e}"}
    bad = {k: v for k, v in results.items()
           if v.get("err") or not v.get("hash_match")}
    print(json.dumps(results, indent=1, default=str))
    # Persist the compared tally next to the Verify output so
    # update_counts.py publishes COMPARED-green counts, never
    # declared-oracle counts (the r11 "0 failures" drift).
    with open(os.path.join(outdir, "selfcheck_results.json"), "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"\n{len(results) - len(bad)}/{len(results)} green; failures: {sorted(bad)}",
          file=sys.stderr)
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
