"""Build a K-times replication of a testdata sf directory for scaling runs.

Usage: python tools/make_scaled.py [src_sf_dir] [dst_dir] [K]
       (defaults: /root/testdata/sf0.1  .tmp/sf1ish  10)

Replication preserves the schema and referential structure while scaling
the parts of the workload that should scale:

- dims (region/nation/customer/supplier/part) are copied — at 100 TB the
  dimension side stays broadcast-sized while facts grow;
- orders/lineitem replicate with disjoint o_orderkey ranges (fact growth);
- events shift +31 days per replica so the EVENT-TIME SPAN scales — the
  streaming windows and state count grow linearly instead of piling 10x
  rows into the same windows;
- documents get a per-replica suffix token: replicas are NEAR-dups (the
  realistic hard case for MinHash/SimHash — candidate sets grow), not
  byte-identical dups;
- embeddings replicate with offset vec_id: ANN corpus grows 10x, query
  set (vec_id < N_QUERIES) stays fixed.

Results feed the PERF.md scaling table; the driver's own testdata only
goes to sf0.1.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else ".tmp/sf1ish"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
con.execute("SET threads TO 16")


def src(t: str) -> str:
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(t: str, sql: str) -> None:
    con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(t, n, flush=True)


REPL = f"(SELECT unnest(generate_series(0,{K-1})) AS k)"

for t in ["region", "nation", "customer", "supplier", "part"]:
    write(t, f"SELECT * FROM {src(t)}")

OK = con.execute(f"SELECT max(o_orderkey)+1 FROM {src('orders')}").fetchone()[0]
write(
    "orders",
    f"""
  SELECT o_orderkey + k*{OK} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, {REPL}
""",
)
write(
    "lineitem",
    f"""
  SELECT l_orderkey + k*{OK} AS l_orderkey, l_partkey, l_suppkey, l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, {REPL}
""",
)
EK = con.execute(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()[0]
# ts writes as TIMESTAMP(MICROS) — the regenerated driver testdata vintage;
# the engine's readers (load_events, read_events_stream) probe the physical
# type and adapt, so the scaled data matches what production reads.
write(
    "events",
    f"""
  SELECT event_id + k*{EK} AS event_id,
         ts + to_days(CAST(31*k AS INTEGER)) AS ts,
         user_id, event_type, value, props
  FROM {src('events')}, {REPL}
""",
)
DK = con.execute(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()[0]
write(
    "documents",
    f"""
  SELECT doc_id + k*{DK} AS doc_id,
         CASE WHEN k = 0 THEN text ELSE text || ' r' || k END AS text,
         lang, source,
         CASE WHEN k = 0 THEN n_chars ELSE n_chars + length(' r' || k) END AS n_chars
  FROM {src('documents')}, {REPL}
""",
)
VK = con.execute(f"SELECT max(vec_id)+1 FROM {src('embeddings')}").fetchone()[0]
write(
    "embeddings",
    f"""
  SELECT vec_id + k*{VK} AS vec_id, embedding, label
  FROM {src('embeddings')}, {REPL}
""",
)
print("done ->", DST, flush=True)
