"""Synthesize a larger scale factor from sf0.1 by key-offset replication.

The driver ships fixtures up to sf0.1, where the bench is dominated by
per-query fixed costs (BASELINE.md: a ~60–100 ms parse/analyze/py4j floor
vs 13–109 ms DuckDB queries). To put the 2×-of-baseline comparison on
throughput-dominated ground, this script manufactures sf1 (10× sf0.1) with
DuckDB: each copy shifts every key family (orderkey, custkey, partkey,
doc_id, event/user ids) by copy_index × (max_key + 1), so joins stay
exactly as selective as the original and distinct counts scale linearly —
the join/agg/window work grows 10× while dimension tables (nation, region)
stay fixed, which is how real warehouses scale.

Usage:
    python tools/make_sf.py [copies] [src_dir] [dst_dir]
Defaults: 10 copies, /root/testdata/sf0.1 -> <repo>/.benchdata/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_sf(copies: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')"
        )

    offs = {
        k: con.execute(f"SELECT MAX({c}) + 1 FROM {t}").fetchone()[0]
        for k, (t, c) in {
            "o": ("orders", "o_orderkey"),
            "c": ("customer", "c_custkey"),
            "p": ("lineitem", "l_partkey"),
            "s": ("lineitem", "l_suppkey"),
            "e": ("events", "event_id"),
            "u": ("events", "user_id"),
            "d": ("documents", "doc_id"),
            "v": ("embeddings", "vec_id"),
        }.items()
    }

    # replicated tables: every key column shifts per copy so cross-table
    # references stay consistent within a copy and disjoint across copies
    replicated = {
        "customer": "SELECT c_custkey + i * {c} AS c_custkey, * EXCLUDE (c_custkey) FROM customer",
        "orders": (
            "SELECT o_orderkey + i * {o} AS o_orderkey,"
            " o_custkey + i * {c} AS o_custkey,"
            " * EXCLUDE (o_orderkey, o_custkey) FROM orders"
        ),
        "lineitem": (
            "SELECT l_orderkey + i * {o} AS l_orderkey,"
            " l_partkey + i * {p} AS l_partkey,"
            " l_suppkey + i * {s} AS l_suppkey,"
            " * EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM lineitem"
        ),
        "events": (
            "SELECT event_id + i * {e} AS event_id,"
            " user_id + i * {u} AS user_id,"
            " * EXCLUDE (event_id, user_id) FROM events"
        ),
        "documents": "SELECT doc_id + i * {d} AS doc_id, * EXCLUDE (doc_id) FROM documents",
        "embeddings": "SELECT vec_id + i * {v} AS vec_id, * EXCLUDE (vec_id) FROM embeddings",
    }
    for t, tmpl in replicated.items():
        body = tmpl.format(**offs)
        sql = (
            f"COPY (SELECT q.* FROM range({copies}) r(i), LATERAL ({body}) q) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(sql)
        print(t, con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0])

    # dimension tables: fixed-size at any SF (the realistic shape)
    for t in ("region", "nation", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM {t}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied 1x")


if __name__ == "__main__":
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, ".benchdata", "sf1")
    make_sf(copies, src, dst)
