#!/usr/bin/env python
"""Amplify the driver's sf0.1 parquet into an sfN set for scaling runs.

The driver generates sf{0.001,0.01,0.1} only; the 100x-design claims
need at least one measured decade (VERDICT r5 item 8), so this script
builds sf1 (or any multiple) by KEY-OFFSET REPLICATION of sf0.1 in
DuckDB: each fact-table copy k shifts every entity key by k*stride with
ONE shared stride per entity, so referential integrity (orders.custkey
-> customer, lineitem.orderkey -> orders, ...) holds across copies and
join fan-outs keep their sf0.1 shape. Dimension tables (region, nation)
are fixed by schema, like TPC-H.

Two content perturbations keep WORKLOAD character honest at scale:

* documents: copy k>0 appends a per-copy tag token to the text — ten
  verbatim copies of the corpus would hand the dedup family a 100x
  cross-copy duplicate blowup that says nothing about plan scaling.
* embeddings: copy k>0 nudges dimension (k-1) mod 64 by k*1e-3 — same
  reason for the near-dup/ANN family.

Counts (events, wordcount, aggregates) see a clean ~Nx row scale-up.

Usage: python scripts/make_scaledata.py [outdir] [copies]
Default: .scaledata/sf1 next to the repo root, 10 copies.
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# per-entity key strides: > max key at sf0.1, round for readability
STRIDES = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def copy_sql(table: str, k: int) -> str:
    s = {name: k * stride for name, stride in STRIDES.items()}
    base = f"SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
    if k == 0:
        shifted = {
            "customer": base,
            "supplier": base,
            "part": base,
            "orders": base,
            "lineitem": base,
            "events": base,
            "documents": base,
            "embeddings": base,
        }
        return shifted[table]
    return {
        "customer": f"""
            SELECT c_custkey + {s['custkey']} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{SRC}/customer.parquet')""",
        "supplier": f"""
            SELECT s_suppkey + {s['suppkey']} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM read_parquet('{SRC}/supplier.parquet')""",
        "part": f"""
            SELECT p_partkey + {s['partkey']} AS p_partkey, p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM read_parquet('{SRC}/part.parquet')""",
        "orders": f"""
            SELECT o_orderkey + {s['orderkey']} AS o_orderkey,
                   o_custkey + {s['custkey']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet')""",
        "lineitem": f"""
            SELECT l_orderkey + {s['orderkey']} AS l_orderkey,
                   l_partkey + {s['partkey']} AS l_partkey,
                   l_suppkey + {s['suppkey']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet')""",
        "events": f"""
            SELECT event_id + {s['event_id']} AS event_id, ts,
                   user_id + {s['user_id']} AS user_id, event_type,
                   value, props
            FROM read_parquet('{SRC}/events.parquet')""",
        "documents": f"""
            SELECT doc_id + {s['doc_id']} AS doc_id,
                   text || ' replicatag{k}' AS text, lang, source,
                   n_chars + {10 + (1 if k >= 10 else 0)} AS n_chars
            FROM read_parquet('{SRC}/documents.parquet')""",
        "embeddings": f"""
            SELECT vec_id + {s['vec_id']} AS vec_id,
                   list_transform(
                     list_zip(embedding,
                              range(0, len(embedding))),
                     z -> CASE WHEN z[2] = {(k - 1) % 64}
                               THEN CAST(z[1] + {k} * 0.001 AS FLOAT)
                               ELSE z[1] END) AS embedding,
                   label
            FROM read_parquet('{SRC}/embeddings.parquet')""",
    }[table]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".scaledata", "sf1"
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet'))"
            f" TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(table, "copied (dimension, fixed)")
    for table in ("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"):
        union = "\nUNION ALL\n".join(
            copy_sql(table, k) for k in range(copies)
        )
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(table, n, "rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
