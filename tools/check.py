#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
library itself is pure Scala). Reads the Verify.scala output dir,
runs each oracle SQL in DuckDB over the same sf dir, compares.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # sort columns by name, then rows by all columns (stringified for stability)
    df = df[sorted(df.columns)]
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    df = df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[MISS] {name}: no spark output")
            fails += 1
            continue
        got = norm(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        want = norm(con.sql(sql).df())
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(want.columns)}")
            fails += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
            fails += 1
            continue
        eq = got.astype(str).eq(want.astype(str)).all().all()
        if not eq:
            diff = (got.astype(str) != want.astype(str))
            bad = diff.any(axis=1)
            print(f"[FAIL] {name}: {int(bad.sum())} mismatched rows; first:")
            print("  got :", got[bad].head(3).to_dict("records"))
            print("  want:", want[bad].head(3).to_dict("records"))
            fails += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
