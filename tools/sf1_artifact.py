#!/usr/bin/env python3
"""Assemble the builder-side sf1 correctness artifact
(CORRECTNESS_SF1_r<N>.json) from a Verify output dir over the
synthesized sf1 corpus (tools/gen_sf1.py): run every oracle SQL in
DuckDB at sf1, compare like tools/check.py, and record per-query
status + row counts.

Usage: python3 tools/sf1_artifact.py <sf1Dir> <verifyOutDir> <round> <outJson>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def main():
    sf_dir, out_dir, rnd, out_json = sys.argv[1:5]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results, n_ok = {}, 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            results[name] = {"status": "miss"}
            continue
        try:
            got = norm(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            want = norm(con.sql(sql).df())
            if list(got.columns) != list(want.columns):
                results[name] = {"status": "schema_mismatch"}
            elif len(got) != len(want):
                results[name] = {"status": "row_mismatch",
                                 "rows": len(got), "oracle_rows": len(want)}
            elif not got.astype(str).eq(want.astype(str)).all().all():
                results[name] = {"status": "value_mismatch", "rows": len(got)}
            else:
                results[name] = {"status": "ok", "rows": len(got)}
                n_ok += 1
        except Exception as e:  # oracle errors surface, not crash
            results[name] = {"status": "err", "err": str(e)[:200]}
    artifact = {
        "sf": "1 (10x synthesized, tools/gen_sf1.py from sf0.1)",
        "round": int(rnd),
        "oracle_queries_checked": len(results),
        "all_green": n_ok == len(results),
        "n_ok": n_ok,
        "queries": results,
    }
    json.dump(artifact, open(out_json, "w"), indent=1, sort_keys=True)
    print(f"{n_ok}/{len(results)} ok -> {out_json}")


if __name__ == "__main__":
    main()
