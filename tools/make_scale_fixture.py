#!/usr/bin/env python3
"""Synthesize a larger scale-factor fixture by sharding an existing one
(driver-side tooling, like oracle_check.py — not engine code).

Each shard k offsets every key family by k * (max_key + 1), so FK
integrity (orders->customer, lineitem->orders/part/supplier) is
preserved and the per-shard distributions are untouched. Content
columns are perturbed per shard (documents.text gains a shard token,
embeddings get a tiny deterministic dim-0 offset) so cross-shard rows
are NOT byte-duplicates — replicating text verbatim would grow dedup
pair counts quadratically and junk the scaling measurement.

Usage: make_scale_fixture.py <srcDir> <dstDir> <shards>
"""
import sys
import duckdb

src, dst, shards = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()

import os
os.makedirs(dst, exist_ok=True)


def src_tbl(name: str) -> str:
    return f"read_parquet('{src}/{name}.parquet')"


def max_of(table: str, col: str) -> int:
    return con.execute(
        f"SELECT max({col}) FROM {src_tbl(table)}").fetchone()[0]


C = max_of('customer', 'c_custkey') + 1
S = max_of('supplier', 's_suppkey') + 1
P = max_of('part', 'p_partkey') + 1
O = max_of('orders', 'o_orderkey') + 1
E = max_of('events', 'event_id') + 1
U = max_of('events', 'user_id') + 1
D = max_of('documents', 'doc_id') + 1
V = max_of('embeddings', 'vec_id') + 1


def emit(name: str, select_for_shard):
    parts = " UNION ALL ".join(select_for_shard(k) for k in range(shards))
    con.execute(f"COPY ({parts}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')"
    ).fetchone()[0]
    print(f"{name}: {n} rows")


# dimension tables stay as-is (shared across shards, like a real lake)
for t in ('region', 'nation'):
    emit(t, lambda k, t=t: f"SELECT * FROM {src_tbl(t)}" if k == 0 else
         f"SELECT * FROM {src_tbl(t)} WHERE 1=0")

emit('customer', lambda k:
     f"SELECT c_custkey + {k * C} AS c_custkey, * EXCLUDE (c_custkey) "
     f"FROM {src_tbl('customer')}")
emit('supplier', lambda k:
     f"SELECT s_suppkey + {k * S} AS s_suppkey, * EXCLUDE (s_suppkey) "
     f"FROM {src_tbl('supplier')}")
emit('part', lambda k:
     f"SELECT p_partkey + {k * P} AS p_partkey, * EXCLUDE (p_partkey) "
     f"FROM {src_tbl('part')}")
emit('orders', lambda k:
     f"SELECT o_orderkey + {k * O} AS o_orderkey, "
     f"o_custkey + {k * C} AS o_custkey, "
     f"* EXCLUDE (o_orderkey, o_custkey) FROM {src_tbl('orders')}")
emit('lineitem', lambda k:
     f"SELECT l_orderkey + {k * O} AS l_orderkey, "
     f"l_partkey + {k * P} AS l_partkey, "
     f"l_suppkey + {k * S} AS l_suppkey, "
     f"* EXCLUDE (l_orderkey, l_partkey, l_suppkey) "
     f"FROM {src_tbl('lineitem')}")
emit('events', lambda k:
     f"SELECT event_id + {k * E} AS event_id, "
     f"user_id + {k * U} AS user_id, "
     f"* EXCLUDE (event_id, user_id) FROM {src_tbl('events')}")
emit('documents', lambda k:
     f"SELECT doc_id + {k * D} AS doc_id, "
     f"text || ' shard{k}tok' AS text, "
     f"n_chars + {len(f' shard{k}tok')} AS n_chars, "
     f"* EXCLUDE (doc_id, text, n_chars) FROM {src_tbl('documents')}")
emit('embeddings', lambda k:
     f"SELECT vec_id + {k * V} AS vec_id, "
     f"list_prepend(CAST(embedding[1] + {k} * 0.0011 AS FLOAT), "
     f"embedding[2:]) AS embedding, "
     f"* EXCLUDE (vec_id, embedding) FROM {src_tbl('embeddings')}")
