#!/usr/bin/env python3
"""Synthesize sf1 from sf0.1 per the SCALING_PROBE.md recipe:
10 deterministic key-shifted copies — every FK shifts by copy*N so
referential integrity holds per copy; documents.text gets a per-copy
token suffix so shingle/dup structure stays sparse; embeddings are
rotated by `copy` dims so ANN pair structure decorrelates; copy 0 is
byte-identical to sf0.1. region/nation stay schema-bounded (1 copy).

Usage: python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/graft_sf1
"""
import sys

import duckdb

src, dst = sys.argv[1], sys.argv[2]
import os

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# per-key shift bases: max(key)+1 at sf0.1
base = {}
for key, table in [("c_custkey", "customer"), ("s_suppkey", "supplier"),
                   ("p_partkey", "part"), ("o_orderkey", "orders"),
                   ("event_id", "events"), ("user_id", "events"),
                   ("doc_id", "documents"), ("vec_id", "embeddings")]:
    base[key] = con.sql(
        f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

copies = "(SELECT unnest(range(10)) AS cp)"


def emit(table, select):
    con.sql(f"COPY ({select}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n0 = con.sql(f"SELECT count(*) FROM '{src}/{table}.parquet'").fetchone()[0]
    n1 = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n0} -> {n1}")


# dims stay schema-bounded: single copy
for t in ("region", "nation"):
    emit(t, f"SELECT * FROM '{src}/{t}.parquet'")

emit("customer", f"""
  SELECT c_custkey + cp * {base['c_custkey']} AS c_custkey, c_name,
    c_nationkey, c_acctbal, c_mktsegment
  FROM '{src}/customer.parquet', {copies}""")

emit("supplier", f"""
  SELECT s_suppkey + cp * {base['s_suppkey']} AS s_suppkey, s_name,
    s_nationkey, s_acctbal
  FROM '{src}/supplier.parquet', {copies}""")

emit("part", f"""
  SELECT p_partkey + cp * {base['p_partkey']} AS p_partkey, p_name,
    p_brand, p_type, p_size, p_retailprice
  FROM '{src}/part.parquet', {copies}""")

emit("orders", f"""
  SELECT o_orderkey + cp * {base['o_orderkey']} AS o_orderkey,
    o_custkey + cp * {base['c_custkey']} AS o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', {copies}""")

emit("lineitem", f"""
  SELECT l_orderkey + cp * {base['o_orderkey']} AS l_orderkey,
    l_partkey + cp * {base['p_partkey']} AS l_partkey,
    l_suppkey + cp * {base['s_suppkey']} AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet', {copies}""")

emit("events", f"""
  SELECT event_id + cp * {base['event_id']} AS event_id, ts,
    user_id + cp * {base['user_id']} AS user_id, event_type, value, props
  FROM '{src}/events.parquet', {copies}""")

# per-copy token suffix keeps shingle/dup structure sparse like a real
# 10x corpus (copy 0 byte-identical)
emit("documents", f"""
  SELECT doc_id + cp * {base['doc_id']} AS doc_id,
    CASE WHEN cp = 0 THEN text
         ELSE text || ' cpx' || CAST(cp AS VARCHAR) END AS text,
    lang, source,
    CASE WHEN cp = 0 THEN n_chars
         ELSE n_chars + length(' cpx' || CAST(cp AS VARCHAR)) END AS n_chars
  FROM '{src}/documents.parquet', {copies}""")

# rotate embeddings by cp dims per copy: norms exact, directions
# decorrelated (copy 0 identity)
emit("embeddings", f"""
  SELECT vec_id + cp * {base['vec_id']} AS vec_id,
    CASE WHEN cp = 0 THEN embedding
         ELSE list_concat(embedding[cp + 1:], embedding[1:cp])
    END AS embedding,
    label
  FROM '{src}/embeddings.parquet', {copies}""")
