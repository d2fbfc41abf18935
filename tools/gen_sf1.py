#!/usr/bin/env python3
"""Synthesize an sf1 (10x) corpus from sf0.1 as ten KEY-DISJOINT shards.

This persists the recipe SCALE.md describes (round 10) so future
rounds can regenerate the scale-up corpus instead of re-deriving it:

- customer/orders/lineitem: custkeys shifted by exactly 15000 per copy
  (keeps the key space DENSE -- q54's parent-walk derives edges
  arithmetically from custkeys and breaks on a gap-ridden key space);
  orderkeys shifted by 6,000,000 per copy (disjoint, sparse like the
  original);
- documents: every token suffixed `~<copy>` for copies >= 1, so copies
  share ZERO shingles -- no artificial cross-copy near-dup cliques;
  doc_ids shifted by 5000 per copy; n_chars recomputed;
- embeddings: dimensions circularly rolled per copy -- cross-copy
  cosines stay uncorrelated; vec_ids shifted by 20000 per copy;
- events/orders keep their original time range (10x density; see
  SCALE.md's density-vs-horizon analysis for q34).

Usage: python3 tools/gen_sf1.py /root/testdata/sf0.1 /tmp/graft_sf1 [tables...]
"""
import sys

import duckdb

COPIES = 10
CUST_STEP = 15000
ORDER_STEP = 6_000_000
DOC_STEP = 5000
VEC_STEP = 20000
LINE_STEP = 6_000_000


def gen(src: str, dst: str, tables):
    con = duckdb.connect()
    import os
    os.makedirs(dst, exist_ok=True)

    def shard_union(select_per_copy):
        return " UNION ALL ".join(select_per_copy(c) for c in range(COPIES))

    sql = {}
    sql["customer"] = shard_union(lambda c: f"""
        SELECT c_custkey + {c * CUST_STEP} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet'""")
    sql["orders"] = shard_union(lambda c: f"""
        SELECT o_orderkey + {c * ORDER_STEP} AS o_orderkey,
               o_custkey + {c * CUST_STEP} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'""")
    sql["lineitem"] = shard_union(lambda c: f"""
        SELECT l_orderkey + {c * LINE_STEP} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'""")
    sql["documents"] = shard_union(lambda c: f"""
        SELECT doc_id + {c * DOC_STEP} AS doc_id,
               {"text" if c == 0 else
                f"array_to_string(list_transform(str_split(text, ' '), t -> t || '~{c}'), ' ')"} AS text,
               lang, source,
               {"n_chars" if c == 0 else
                f"length(array_to_string(list_transform(str_split(text, ' '), t -> t || '~{c}'), ' '))"} AS n_chars
        FROM '{src}/documents.parquet'""")
    sql["embeddings"] = shard_union(lambda c: f"""
        SELECT vec_id + {c * VEC_STEP} AS vec_id,
               {"embedding" if c == 0 else
                f"list_concat(embedding[{c + 1}:], embedding[:{c}])"} AS embedding,
               label
        FROM '{src}/embeddings.parquet'""")
    # events: ten user-disjoint shards (user_ids shifted by 1500, the
    # dense key step; event_ids by 100000) -- per-user timelines keep
    # their exact structure, the corpus gains 10x users at the same
    # per-user density, so the events-table queries (MAD fences,
    # time-weighted averages, variant extraction, sessionization)
    # scale honestly. r10 change: the r9 recipe passed events through
    # unchanged, leaving those queries with no 10x signal.
    sql["events"] = shard_union(lambda c: f"""
        SELECT event_id + {c * 100000} AS event_id, ts,
               user_id + {c * 1500} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet'""")
    for t in ("region", "nation", "part", "supplier"):
        sql[t] = f"SELECT * FROM '{src}/{t}.parquet'"

    for t in tables:
        con.execute(
            f"COPY ({sql[t]}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    tables = sys.argv[3:] or ["customer", "orders", "lineitem",
                              "documents", "embeddings", "region",
                              "nation", "part", "supplier", "events"]
    gen(src, dst, tables)
