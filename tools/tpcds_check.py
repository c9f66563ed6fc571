#!/usr/bin/env python3
"""TPC-DS breadth-gate comparator: run each reference query in DuckDB over
the SAME parquet fixtures graft's Spark runner read, load graft's dumped
result parquet, and compare.

Comparison contract (mirrors the reference comparator's value rules while
removing its tie-order special cases): both result sets are sorted by every
column (None first), then compared cell-wise — numerics match when
|e - a| <= 0.01 or the relative deviation is <= 0.01 (the reference's
TOLERATED_DOUBLE_DEVIATION), everything else by string equality. Sorting
both sides replaces the reference's hand-rolled per-query tie fixups
(query34/77/79) with a uniform rule.

Usage: python3 tools/tpcds_check.py <dataDir> <queryDir> <sparkOutDir> <reportJson>
"""
import json
import math
import pathlib
import sys

import duckdb
import pyarrow.parquet as pq

TOL = 0.01

TABLES = [
    "call_center", "catalog_page", "catalog_returns", "catalog_sales",
    "customer", "customer_address", "customer_demographics", "date_dim",
    "household_demographics", "income_band", "inventory", "item",
    "promotion", "reason", "ship_mode", "store", "store_returns",
    "store_sales", "time_dim", "warehouse", "web_page", "web_returns",
    "web_sales", "web_site",
]


def norm(v):
    """Normalize a cell for sorting/comparison across engines."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float) and math.isnan(v):
        return None
    try:  # Decimal, numpy types -> float; datetime/date -> str
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    if isinstance(v, (int, float)):
        return v
    return str(v)


def sort_key(row):
    return tuple((v is not None, v if isinstance(v, (int, float)) else str(v))
                 for v in row)


def cells_equal(e, a):
    if e is None or a is None:
        return e is None and a is None
    if isinstance(e, (int, float)) and isinstance(a, (int, float)):
        if abs(e - a) <= TOL:
            return True
        denom = max(abs(e), abs(a))
        return denom > 0 and abs(e - a) / denom <= TOL
    # a numeric on one side only: try parsing the other
    try:
        return abs(float(e) - float(a)) <= TOL
    except (TypeError, ValueError):
        return str(e) == str(a)


def compare(expected, actual):
    if len(expected) != len(actual):
        return False, f"row count: oracle {len(expected)} vs spark {len(actual)}"
    exp = sorted([tuple(norm(c) for c in r) for r in expected], key=sort_key)
    act = sorted([tuple(norm(c) for c in r) for r in actual], key=sort_key)
    for i, (er, ar) in enumerate(zip(exp, act)):
        if len(er) != len(ar):
            return False, f"column count: {len(er)} vs {len(ar)}"
        for j, (ec, ac) in enumerate(zip(er, ar)):
            if not cells_equal(ec, ac):
                return False, f"row {i} col {j}: oracle {ec!r} vs spark {ac!r}"
    return True, None


# Oracle-side dialect patches (applied to the DuckDB text only). Both are
# the same issue: ANSI resolves a bare ORDER BY name against the SELECT
# list's OUTPUT column first (Spark/Flink do), DuckDB binds input columns
# and calls the reference ambiguous. Qualifying with the table the output
# column came from is semantics-preserving.
DIALECT_PATCHES = {
    "query58": [("order by item_id", "order by ss_items.item_id")],
    "query72": [("order by total_cnt desc, i_item_desc, w_warehouse_name, d_week_seq",
                 "order by total_cnt desc, i_item_desc, w_warehouse_name, d1.d_week_seq")],
}


def main():
    data_dir, query_dir, out_dir, report = (pathlib.Path(p) for p in sys.argv[1:5])
    con = duckdb.connect()
    # Spark/Flink sort NULLS FIRST on ASC and NULLS LAST on DESC; DuckDB's
    # default differs, which changes WHICH rows survive a LIMIT under
    # ORDER BY on nullable (e.g. rollup) columns — align the oracle.
    con.execute("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{data_dir}/{t}.parquet')")

    runner_errors = {}
    err_file = out_dir / "errors.json"
    if err_file.exists():
        runner_errors = json.loads(err_file.read_text())

    results = {}
    n_pass = 0
    for qf in sorted(query_dir.glob("query*.sql")):
        name = qf.stem
        if name in runner_errors:
            results[name] = {"status": "spark_error", "detail": runner_errors[name]}
            print(f"[ err] {name}: {runner_errors[name][:120]}")
            continue
        spark_parquet = out_dir / f"{name}.parquet"
        if not spark_parquet.exists():
            results[name] = {"status": "missing", "detail": "no spark output"}
            print(f"[miss] {name}")
            continue
        try:
            # the query set quotes reserved identifiers Flink/Spark-style
            # (`at`, `returns`); DuckDB wants ANSI double quotes
            qtext = qf.read_text().replace("`", '"')
            for find, repl in DIALECT_PATCHES.get(name, []):
                assert find in qtext, f"{name}: stale dialect patch '{find}'"
                qtext = qtext.replace(find, repl)
            oracle_rows = con.execute(qtext).fetchall()
        except Exception as e:
            results[name] = {"status": "oracle_error", "detail": str(e)[:300]}
            print(f"[ orc] {name}: {str(e)[:120]}")
            continue
        tbl = pq.read_table(str(spark_parquet))
        spark_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        ok, detail = compare(oracle_rows, spark_rows)
        if ok:
            n_pass += 1
            results[name] = {"status": "pass", "rows": len(oracle_rows)}
            print(f"[ ok ] {name}: {len(oracle_rows)} rows")
        else:
            results[name] = {"status": "mismatch", "detail": detail,
                             "rows_oracle": len(oracle_rows),
                             "rows_spark": len(spark_rows)}
            print(f"[FAIL] {name}: {detail}")

    total = len(results)
    summary = {"pass": n_pass, "total": total, "queries": results}
    report.write_text(json.dumps(summary, indent=1, sort_keys=True))
    print(f"\n{n_pass}/{total} pass -> {report}")


if __name__ == "__main__":
    main()
