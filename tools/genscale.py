#!/usr/bin/env python3
"""Deterministic scale-up of the driver testdata (driver-side tool, like
selfcheck.py — NOT part of the engine).

Usage: python3 tools/genscale.py <srcSfDir> <outDir> [factor=10]

Replicates each fact table `factor`x with key-space offsets (foreign
keys follow the same offsets, so every join/filter/category distribution
of the source is preserved exactly), plus a deterministic +-99-cent
jitter on the money columns so per-group sums are not simple multiples
of the source sums. Dimension tables (nation, region) copy as-is.

Purpose: the round-8 sf1 spot-check of the exact-arithmetic money
contracts (HALF_UP integer-space displays, integer-cents revenue,
128-bit index products). Rounding ties get likelier with row count; the
engine/oracle comparison only needs both sides to read IDENTICAL input
bits, not the driver's exact generator, so a faithful scale-up of the
committed sf0.1 tables is the right input.

Money columns stay exactly 2-decimal: jitter is applied in integer
cents and divided back by 100. documents/embeddings are not scaled
(the money contracts never touch them).
"""
import os
import sys

import duckdb

src, out = sys.argv[1], sys.argv[2]
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT range AS rep FROM range({factor})")

# abs(hash)%199 - 99 => deterministic jitter in [-99, +99] cents;
# floor_cents keeps the jittered value positive (prices >= $1, event
# values >= 1 cent — the money contracts assume non-negative sums)
def cents_jitter(col, salt, floor_cents=100):
    # hash() is UBIGINT: reduce mod 199 in unsigned space FIRST, then cast
    # (a direct CAST(hash AS BIGINT) range-errors on values > 2^63-1)
    return (f"CAST(greatest(CAST(round({col}*100) AS BIGINT) "
            f"+ CAST(hash({salt}) % 199 AS BIGINT) - 99, {floor_cents}) AS DOUBLE)/100")

def gen(table, sql):
    con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

T = lambda t: f"'{src}/{t}.parquet'"

gen("lineitem", f"""
SELECT l_orderkey + rep*10000000 AS l_orderkey,
       l_partkey  + rep*10000000 AS l_partkey,
       l_suppkey  + rep*1000000  AS l_suppkey,
       l_linenumber, l_quantity,
       {cents_jitter('l_extendedprice', 'l_orderkey*7 + l_linenumber*131 + rep')} AS l_extendedprice,
       l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
FROM {T('lineitem')}, reps""")

gen("orders", f"""
SELECT o_orderkey + rep*10000000 AS o_orderkey,
       o_custkey  + rep*10000000 AS o_custkey,
       o_orderstatus,
       {cents_jitter('o_totalprice', 'o_orderkey*13 + rep')} AS o_totalprice,
       o_orderdate, o_orderpriority
FROM {T('orders')}, reps""")

gen("customer", f"""
SELECT c_custkey + rep*10000000 AS c_custkey,
       c_name, c_nationkey, c_acctbal, c_mktsegment
FROM {T('customer')}, reps""")

gen("supplier", f"""
SELECT s_suppkey + rep*1000000 AS s_suppkey,
       s_name, s_nationkey, s_acctbal
FROM {T('supplier')}, reps""")

gen("part", f"""
SELECT p_partkey + rep*10000000 AS p_partkey,
       p_name, p_brand, p_type, p_size, p_retailprice
FROM {T('part')}, reps""")

gen("events", f"""
SELECT event_id + rep*10000000 AS event_id,
       ts,
       user_id + rep*1000000 AS user_id,
       event_type,
       {cents_jitter('value', 'event_id*17 + rep', floor_cents=1)} AS value,
       props
FROM {T('events')}, reps""")

for t in ("nation", "region"):
    gen(t, f"SELECT * FROM {T(t)}")
