#!/usr/bin/env python3
"""Scale the documents/embeddings tables by an integer factor K for the
bench scaling spot-check (SURVEY §6): each copy i is DECORRELATED from the
others — document token streams are deterministically PERMUTED per copy
(hash order keyed by copy index; a mere rotation would preserve every
interior n-gram and make copies near-duplicates of each other) and
embedding vectors circular-shift by i positions — so corpus statistics
(vocab, token frequencies, lengths, norms) are preserved while cross-copy
near-duplicate pairs are not created. Plain K-fold duplication would make
every pair operator's OUTPUT grow ~K^2 (every doc gains K-1 twins) and
the scaling measurement would measure the pathological data, not the
plan.

Usage: scale_corpus.py <src_sf_dir> <dst_dir> <K>
Driver-side tooling only (duckdb), like check.py — never a library dep.
"""
import os
import sys

import duckdb

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

con.execute(rf"""
COPY (
  WITH d AS (SELECT *, string_split_regex(text, '\s+') AS toks
             FROM read_parquet('{src}/documents.parquet')),
       mx AS (SELECT max(doc_id) + 1 AS m FROM d),
       ex AS (SELECT d.doc_id, r.i, unnest(d.toks) AS tok,
                     generate_subscripts(d.toks, 1) AS pos,
                     d.lang, d.source, d.n_chars
              FROM d CROSS JOIN range({k}) r(i)),
       re AS (SELECT doc_id, i, lang, source, n_chars,
                     array_to_string(list(tok ORDER BY
                       CASE WHEN i = 0 THEN lpad(pos::VARCHAR, 9, '0')
                            ELSE md5(tok || ':' || pos || ':' || i) END, pos), ' ') AS text
              FROM ex GROUP BY doc_id, i, lang, source, n_chars)
  SELECT re.doc_id + re.i * mx.m AS doc_id, re.text, re.lang, re.source, re.n_chars
  FROM re CROSS JOIN mx
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  WITH e AS (SELECT * FROM read_parquet('{src}/embeddings.parquet')),
       mx AS (SELECT max(vec_id) + 1 AS m FROM e)
  SELECT e.vec_id + r.i * mx.m AS vec_id,
         CASE WHEN r.i = 0 THEN e.embedding
              ELSE list_concat(e.embedding[1 + (r.i % len(e.embedding)):],
                               e.embedding[:(r.i % len(e.embedding))])
         END AS embedding,
         e.label
  FROM e CROSS JOIN range({k}) r(i) CROSS JOIN mx
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")

# Events scale by disjoint-key replication: copy i offsets user_id and
# event_id past the originals, so keys never collide across copies. The
# per-key operators (sessionize, funnel, retention) see K x users with the
# SAME per-user history shape — exactly how an event corpus grows — and no
# cross-copy interaction exists because no operator pairs events across
# keys. (No decorrelation permutation needed: there is no pair operator on
# events whose output a twin copy would inflate.)
# The user-key offset is SHARED between events and orders (greatest of
# the two key maxima): asof_join joins events.user_id to orders.o_custkey,
# so copy i's events must land on copy i's orders — per-copy match
# structure identical to the original, never cross-copy, never orphaned.
mu = 0
if os.path.exists(f"{src}/events.parquet"):
    mu = con.execute(
        f"SELECT max(user_id) + 1 FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
if os.path.exists(f"{src}/orders.parquet"):
    mu = max(mu, con.execute(
        f"SELECT max(o_custkey) + 1 FROM read_parquet('{src}/orders.parquet')"
    ).fetchone()[0])

if os.path.exists(f"{src}/events.parquet"):
    con.execute(f"""
    COPY (
      WITH ev AS (SELECT * FROM read_parquet('{src}/events.parquet')),
           mx AS (SELECT max(event_id) + 1 AS me FROM ev)
      SELECT ev.event_id + r.i * mx.me AS event_id, ev.ts,
             ev.user_id + r.i * {mu} AS user_id,
             ev.event_type, ev.value, ev.props
      FROM ev CROSS JOIN range({k}) r(i) CROSS JOIN mx
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)

# Orders scale by the same disjoint-key replication: K x customers with
# the SAME per-customer order history (dates/prices untouched, so the
# time span — and orders_monthly's bounded month output — is preserved
# while per-month volume grows K x, exactly how an order stream grows).
if os.path.exists(f"{src}/orders.parquet"):
    con.execute(f"""
    COPY (
      WITH o AS (SELECT * FROM read_parquet('{src}/orders.parquet')),
           mx AS (SELECT max(o_orderkey) + 1 AS mo FROM o)
      SELECT o.o_orderkey + r.i * mx.mo AS o_orderkey,
             o.o_custkey + r.i * {mu} AS o_custkey,
             o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority
      FROM o CROSS JOIN range({k}) r(i) CROSS JOIN mx
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
    """)

for t in ("documents", "embeddings", "events", "orders"):
    if not os.path.exists(f"{dst}/{t}.parquet"):
        continue
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows -> {dst}")
