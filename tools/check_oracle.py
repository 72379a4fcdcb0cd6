#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet written by
graft.Verify, sort columns by name + rows by value, and compare exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> list:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    rows = sorted([tuple(str(v) for v in r) for r in df.itertuples(index=False)])
    return rows


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if sorted(got.columns.str.lower()) != sorted(want.columns.str.lower()):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} duckdb={sorted(want.columns)}")
            n_fail += 1
        elif g != w:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows; first diffs:")
            for a, b in list(zip(g, w))[:200]:
                if a != b:
                    print(f"  spark={a}\n  duck ={b}")
                    break
            only_g = [r for r in g if r not in set(w)][:3]
            only_w = [r for r in w if r not in set(g)][:3]
            if only_g:
                print(f"  only-spark: {only_g}")
            if only_w:
                print(f"  only-duck : {only_w}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(g)} rows)")
    # queries with no oracle: rows-only
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS-ONLY {d}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
