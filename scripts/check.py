#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: check.py <verify_out_dir> <sf_dir>
Reads <out>/oracle_sql.json + <out>/<name>/ parquet (Spark results),
runs each oracle SQL in DuckDB over the sf parquet tables, compares
schema + rows (columns sorted by name, rows sorted, exact equality).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            exp = con.sql(oracle[name]).df()
            files = glob.glob(f"{out}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            e, g = norm(exp), norm(got)
            if list(e.columns) != list(g.columns):
                print(f"FAIL {name}: columns exp={list(e.columns)} got={list(g.columns)}")
                n_fail += 1; continue
            if len(e) != len(g):
                print(f"FAIL {name}: rows exp={len(e)} got={len(g)}")
                n_fail += 1; continue
            ok = True
            for c in e.columns:
                ev, gv = e[c].values, g[c].values
                for i in range(len(ev)):
                    a, b = ev[i], gv[i]
                    same = (a == b) or (
                        (a is None or (isinstance(a, float) and math.isnan(a))) and
                        (b is None or (isinstance(b, float) and math.isnan(b))))
                    if not same:
                        print(f"FAIL {name}: col={c} row={i} exp={a!r} got={b!r}  "
                              f"(types {type(a).__name__}/{type(b).__name__})")
                        ok = False; break
                if not ok: break
            if ok:
                # strict: dtypes too
                dt = [(c, str(e[c].dtype), str(g[c].dtype)) for c in e.columns
                      if str(e[c].dtype) != str(g[c].dtype)]
                tag = f" [dtype diff: {dt}]" if dt else ""
                print(f"PASS {name} ({len(e)} rows){tag}")
                n_pass += 1
            else:
                n_fail += 1
        except Exception as ex:
            print(f"FAIL {name}: EXC {str(ex)[:200]}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
