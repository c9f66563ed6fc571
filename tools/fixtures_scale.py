#!/usr/bin/env python3
"""Scale the driver-generated fixtures by integer replication for larger
bench points (e.g. sf0.1 x10 -> sf1-equivalent).

Replication preserves the source distributions exactly while scaling
row counts linearly:

- TPC-H-ish tables: copy i shifts every key (orderkey/custkey/partkey/
  suppkey) by i * (max_key + 1), so foreign-key join fan-out and
  selectivity are IDENTICAL per copy. nation/region are dims - copied
  verbatim once.
- events: copy i shifts event_id and shifts ts by i * (span + 1h) -
  the time axis extends, so windows/sessions per key scale linearly
  (densifying the same range would merge sessions non-linearly).
- documents: copy i>0 rewrites every token with a copy-specific
  character rotation. Cross-copy Jaccard collapses to ~0, so near-dup
  CLUSTER STRUCTURE is replicated per copy (10x clusters of the same
  size) instead of merging copies into 10x-bigger clusters - pair
  generation scales linearly, matching real corpus growth.
- embeddings: copy i shifts vec_id and adds a tiny deterministic
  per-copy offset so copies are near but not identical.

Usage: python3 tools/fixtures_scale.py <srcDir> <dstDir> <factor>
"""
import sys

import duckdb


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")

    def rd(t):
        return f"read_parquet('{src}/{t}.parquet')"

    def copies(expr_sql):
        return (f"SELECT t.*, c.i AS __i FROM {expr_sql} t "
                f"CROSS JOIN (SELECT unnest(range({factor})) AS i) c")

    def write(t, sql):
        con.sql(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    # key strides from the source maxima. The customer stride comes from
    # the CUSTOMER table: customers with no orders can hold the max key,
    # and a stride from max(o_custkey) would overlap copies' key ranges
    # (duplicate c_custkey, changed join fan-out per copy).
    strides = {}
    for t, k in [("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("part", "p_partkey"), ("supplier", "s_suppkey")]:
        strides[k] = con.sql(f"SELECT max({k}) + 1 FROM {rd(t)}").fetchone()[0]
    ok, ck = strides["o_orderkey"], strides["c_custkey"]
    pk, sk = strides["p_partkey"], strides["s_suppkey"]

    write("region", f"SELECT * FROM {rd('region')}")
    write("nation", f"SELECT * FROM {rd('nation')}")
    write("customer", f"""
        SELECT c_custkey + __i * {ck} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM ({copies(rd('customer'))})""")
    write("supplier", f"""
        SELECT s_suppkey + __i * {sk} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM ({copies(rd('supplier'))})""")
    write("part", f"""
        SELECT p_partkey + __i * {pk} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM ({copies(rd('part'))})""")
    write("orders", f"""
        SELECT o_orderkey + __i * {ok} AS o_orderkey,
               o_custkey + __i * {ck} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM ({copies(rd('orders'))})""")
    write("lineitem", f"""
        SELECT l_orderkey + __i * {ok} AS l_orderkey,
               l_partkey + __i * {pk} AS l_partkey,
               l_suppkey + __i * {sk} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM ({copies(rd('lineitem'))})""")

    span_us = con.sql(
        f"SELECT epoch_us(max(ts)) - epoch_us(min(ts)) + 3600000000 "
        f"FROM {rd('events')}").fetchone()[0]
    eid = con.sql(f"SELECT max(event_id) + 1 FROM {rd('events')}").fetchone()[0]
    # parquet NANOS unit must match the driver fixtures (Tables.events
    # reads ts via nanosAsLong); duckdb's writer downcasts to micros, so
    # events go through pyarrow with an explicit ns cast
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = con.sql(f"""
        SELECT event_id + __i * {eid} AS event_id,
               ts + to_microseconds(__i * {span_us}) AS ts,
               user_id, event_type, value, props
        FROM ({copies(rd('events'))})""").arrow()
    idx = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(idx, pa.field("ts", pa.timestamp("ns")),
                         tbl.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(tbl, f"{dst}/events.parquet")
    print(f"events: {tbl.num_rows} rows (ts: ns)")

    did = con.sql(f"SELECT max(doc_id) + 1 FROM {rd('documents')}").fetchone()[0]
    # per-copy token rotation: rotate the lowercase alphabet by __i, so
    # copy 0 is verbatim and copies share ~no shingles with each other
    rot = ("CASE WHEN __i = 0 THEN text ELSE "
           "translate(text, 'abcdefghijklmnopqrstuvwxyz', "
           "substr(repeat('abcdefghijklmnopqrstuvwxyz', 2), (__i % 25) + 2, 26)) END")
    write("documents", f"""
        SELECT doc_id + __i * {did} AS doc_id, {rot} AS text,
               lang, source, n_chars
        FROM ({copies(rd('documents'))})""")

    vid = con.sql(f"SELECT max(vec_id) + 1 FROM {rd('embeddings')}").fetchone()[0]
    write("embeddings", f"""
        SELECT vec_id + __i * {vid} AS vec_id,
               CASE WHEN __i = 0 THEN embedding
                    ELSE list_transform(embedding,
                         x -> CAST(x + __i * 0.013 AS FLOAT)) END AS embedding,
               label
        FROM ({copies(rd('embeddings'))})""")


if __name__ == "__main__":
    main()
