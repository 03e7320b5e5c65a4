#!/usr/bin/env python3
"""Regenerate the /tmp/sf1 scale-rehearsal fixture (PLANS.md round-11).

sf0.1 replicated 10x with remapped ids — every document gains 9
near-copies (replica k appends one token " rk"), embeddings perturb
the first component per replica, events/lineitem remap keys so join
cardinalities scale linearly. Small dimension tables copy as-is.

Usage: python3 scripts/make_sf1.py [outDir] [--lowdup]   (default /tmp/sf1)

--lowdup (r14 verdict item 6): the default fixture is ~90%
near-duplicated by design, which stresses collapse paths but
under-stresses DISTINCT volume (vocabulary growth overflowed an MG
capacity once, r11). With --lowdup only ~10% of replicas are
near-copies; the other ~90% mutate every third word with a
per-replica suffix — shingles diverge (not near-dups) AND the
vocabulary grows ~4x, the regime the text/sketch/BPE rows need.

Driver-side tooling only (duckdb) — never imported by library code.
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
args = [a for a in sys.argv[1:] if not a.startswith("--")]
LOWDUP = "--lowdup" in sys.argv[1:]
OUT = args[0] if args else "/tmp/sf1"

con = duckdb.connect()
con.execute(f"CREATE VIEW k AS SELECT unnest(range(0, 10)) AS k")


def rep(table, sql):
    # >= 40 row groups per file (r13 verdict item 4): a single row
    # group made every scan-fused per-doc stage run at parallelism 1
    # under local[32] — Spark splits parquet files at row-group
    # granularity (split size = totalBytes/defaultParallelism when
    # below maxPartitionBytes), so a multi-row-group file scans with
    # full parallelism and the rehearsal ratios measure the plan, not
    # a serialization artifact. Written through pyarrow: DuckDB's
    # writer clamps row groups to 2048 rows, too coarse for the small
    # tables.
    import pyarrow.parquet as pq
    tbl = con.execute(sql).arrow()
    n = tbl.num_rows
    pq.write_table(tbl, f"{OUT}/{table}.parquet",
                   row_group_size=max(64, n // 40))
    g = pq.ParquetFile(f"{OUT}/{table}.parquet").num_row_groups
    print(f"{table}: {n} rows, {g} row groups")


import os
os.makedirs(OUT, exist_ok=True)

if LOWDUP:
    # replica k of doc d: near-copy only when (d + k) % 10 == 0
    # (~10% of replicas); otherwise every third word gains a
    # per-replica suffix — low jaccard vs the original AND ~4x
    # vocabulary growth (len/3 new word forms per replica)
    rep("documents", f"""
      SELECT doc_id + k * 10000000 AS doc_id,
             CASE
               WHEN k = 0 THEN text
               WHEN (doc_id + k) % 10 = 0 THEN text || ' r' || k
               ELSE array_to_string(list_transform(
                 range(1, len(string_split(text, ' ')) + 1),
                 i -> CASE WHEN (i + k) % 3 = 0
                      THEN string_split(text, ' ')[i] || 'x' || k
                      ELSE string_split(text, ' ')[i] END), ' ')
             END AS text,
             lang, source,
             n_chars + CASE WHEN k = 0 THEN 0 ELSE 3 END AS n_chars
      FROM read_parquet('{SRC}/documents.parquet') CROSS JOIN k""")
else:
    rep("documents", f"""
      SELECT doc_id + k * 10000000 AS doc_id,
             CASE WHEN k = 0 THEN text ELSE text || ' r' || k END AS text,
             lang, source,
             n_chars + CASE WHEN k = 0 THEN 0 ELSE 3 END AS n_chars
      FROM read_parquet('{SRC}/documents.parquet') CROSS JOIN k""")

rep("embeddings", f"""
  SELECT vec_id + k * 10000000 AS vec_id,
         list_prepend(CAST(embedding[1] + k * 0.001 AS FLOAT),
                      embedding[2:]) AS embedding,
         label
  FROM read_parquet('{SRC}/embeddings.parquet') CROSS JOIN k""")

rep("events", f"""
  SELECT event_id + k * 1000000000 AS event_id, ts,
         user_id + k * 1000000 AS user_id, event_type, value, props
  FROM read_parquet('{SRC}/events.parquet') CROSS JOIN k""")

rep("lineitem", f"""
  SELECT l_orderkey + k * 1000000000 AS l_orderkey, l_partkey,
         l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet') CROSS JOIN k""")

rep("orders", f"""
  SELECT o_orderkey + k * 1000000000 AS o_orderkey, o_custkey,
         * EXCLUDE (o_orderkey, o_custkey)
  FROM read_parquet('{SRC}/orders.parquet') CROSS JOIN k""")

for t in ["region", "nation", "customer", "supplier", "part"]:
    con.execute(f"""COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
                    TO '{OUT}/{t}.parquet' (FORMAT PARQUET)""")
    print(f"{t}: copied")
print("done ->", OUT)
