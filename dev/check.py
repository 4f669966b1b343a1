#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part
of the library): reads Verify output (parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same testdata parquet, and compares
row count / schema / value hash with columns sorted by name and rows sorted.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir, name_filter=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if name_filter and name_filter not in name:
            continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}")
            n_bad += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_bad += 1; continue
        gh = pd.util.hash_pandas_object(g.astype(str)).sum()
        eh = pd.util.hash_pandas_object(e.astype(str)).sum()
        if gh != eh:
            diff = (g.astype(str) != e.astype(str))
            bad = diff.any(axis=1)
            print(f"FAIL {name}: hash mismatch; first diffs:")
            print(pd.concat([g[bad].head(3), e[bad].head(3)], keys=["spark", "duckdb"]))
            n_bad += 1; continue
        print(f"OK   {name} ({len(g)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None)
