#!/usr/bin/env python
"""Deterministic scale-up of the driver-generated testdata.

Synthesizes an sf-R*0.1 dataset from /root/testdata/sf0.1 by key-offset
replication, so scaling behavior (shuffle sizes, candidate-pair counts,
partition counts) can be measured above the largest driver-provided SF
without touching the read-only testdata tree.

Replication rules (replica k of R, key offset k * 10**9):

- region/nation: fixed-cardinality dims — copied once, like TPC-H.
- customer/supplier/part/orders/lineitem/events: every primary AND
  foreign key shifted by the replica offset, so FK integrity holds and
  each replica is a disjoint-key copy (group-by cardinalities on keys
  scale ~R; date/segment group cardinalities stay fixed with R* rows
  per group — the realistic big-data shape).
- documents: every word gets a replica prefix (bijective token rename),
  which preserves each replica's internal shingle/Jaccard structure
  EXACTLY while guaranteeing zero cross-replica n-gram overlap — dedup
  candidate counts must therefore scale linearly in R; superlinear
  growth in bench timings flags an O(n^2) path.
- embeddings: copied verbatim under new vec_ids (exact duplicate
  vectors across replicas — the adversarial case for ANN/near-dup:
  every vector gains R-1 planted neighbors).

Usage: python tools/scale_data.py [R] [out_dir]   (defaults: 10 /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
KOFF = 10**9


def scale(r: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, union_sql: str) -> None:
        out = f"{out_dir}/{t}.parquet"
        con.execute(f"COPY ({union_sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows")

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    def replicate(t: str, select_k: str) -> None:
        parts = [select_k.format(off=k * KOFF, k=k) for k in range(r)]
        write(t, " UNION ALL ".join(parts))

    replicate(
        "customer",
        f"SELECT c_custkey + {{off}} AS c_custkey, c_name, c_nationkey,"
        f" c_acctbal, c_mktsegment FROM {src('customer')}",
    )
    replicate(
        "supplier",
        f"SELECT s_suppkey + {{off}} AS s_suppkey, s_name, s_nationkey,"
        f" s_acctbal FROM {src('supplier')}",
    )
    replicate(
        "part",
        f"SELECT p_partkey + {{off}} AS p_partkey, p_name, p_brand, p_type,"
        f" p_size, p_retailprice FROM {src('part')}",
    )
    replicate(
        "orders",
        f"SELECT o_orderkey + {{off}} AS o_orderkey, o_custkey + {{off}} AS"
        f" o_custkey, o_orderstatus, o_totalprice, o_orderdate,"
        f" o_orderpriority FROM {src('orders')}",
    )
    replicate(
        "lineitem",
        f"SELECT l_orderkey + {{off}} AS l_orderkey, l_partkey + {{off}} AS"
        f" l_partkey, l_suppkey + {{off}} AS l_suppkey, l_linenumber,"
        f" l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
        f" l_linestatus, l_shipdate FROM {src('lineitem')}",
    )
    replicate(
        "events",
        f"SELECT event_id + {{off}} AS event_id, ts, user_id + {{off}} AS"
        f" user_id, event_type, value, props FROM {src('events')}",
    )
    replicate(
        "documents",
        f"SELECT doc_id + {{off}} AS doc_id,"
        " regexp_replace(text, '(\\S+)', 'r{k}\\1', 'g') AS text,"
        f" lang, source, n_chars FROM {src('documents')}",
    )
    replicate(
        "embeddings",
        f"SELECT vec_id + {{off}} AS vec_id, embedding, label"
        f" FROM {src('embeddings')}",
    )


if __name__ == "__main__":
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    scale(r, out)
