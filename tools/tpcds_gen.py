#!/usr/bin/env python3
"""Generate deterministic TPC-DS fixtures as parquet via DuckDB's bundled
tpcds extension (dsdgen). The parquet files are the single source of truth
for BOTH engines: graft reads them through Spark, the oracle loads the same
files into DuckDB (tools/tpcds_check.py), so the comparison can never be
polluted by generator nondeterminism.

Usage: python3 tools/tpcds_gen.py [sf] [outDir]
"""
import sys
import pathlib
import duckdb

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
OUT = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "tpcds_data")

TABLES = [
    "call_center", "catalog_page", "catalog_returns", "catalog_sales",
    "customer", "customer_address", "customer_demographics", "date_dim",
    "household_demographics", "income_band", "inventory", "item",
    "promotion", "reason", "ship_mode", "store", "store_returns",
    "store_sales", "time_dim", "warehouse", "web_page", "web_returns",
    "web_sales", "web_site",
]


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CALL dsdgen(sf={SF})")
    for t in TABLES:
        dest = OUT / f"{t}.parquet"
        con.execute(f"COPY {t} TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        print(f"[gen] {t}: {n} rows -> {dest}")


if __name__ == "__main__":
    main()
