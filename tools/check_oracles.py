#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle SQL, mimicking the driver's compare
(sort columns by name, sort rows, exact value match).

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir> [query...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no parquet output")
            n_fail += 1
            continue
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows (no oracle)")
            if len(got) == 0:
                n_fail += 1
                print(f"[FAIL] {name}: rows-only check but 0 rows")
            else:
                n_pass += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if sorted(g.columns) != sorted(e.columns):
            print(f"[FAIL] {name}: columns differ: got {sorted(g.columns)} vs oracle {sorted(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"[FAIL] {name}: row count {len(g)} vs oracle {len(e)}")
            n_fail += 1
            continue
        # The driver's hash is dtype-sensitive (pandas->hash of typed
        # values): an int64 column vs a float64 column with equal values
        # still fails there, so fail it here too.
        dbad = [(c, g[c].dtype, e[c].dtype) for c in g.columns
                if g[c].dtype != e[c].dtype]
        if dbad:
            print(f"[FAIL] {name}: dtype mismatch (driver hash is dtype-sensitive)")
            for c, gd, ed in dbad[:5]:
                print(f"       col={c}: got={gd} oracle={ed}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            gc, ec = g[c], e[c]
            try:
                eq = (gc.astype(object).where(pd.notna(gc), None) ==
                      ec.astype(object).where(pd.notna(ec), None))
                if not bool(eq.all()):
                    idx = eq.idxmin()
                    bad.append((c, idx, gc.iloc[idx], ec.iloc[idx]))
            except Exception as ex:
                bad.append((c, -1, f"compare error: {ex}", ""))
        if bad:
            print(f"[FAIL] {name}: {len(bad)} column(s) differ")
            for c, i, gv, ev in bad[:5]:
                print(f"       col={c} row={i}: got={gv!r} oracle={ev!r} "
                      f"(dtype got={g[c].dtype} exp={e[c].dtype})")
            n_fail += 1
        else:
            print(f"[ ok ] {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
