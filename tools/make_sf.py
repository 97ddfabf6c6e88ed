"""Deterministic synthetic scale-up of a testdata SF directory.

Replicates every fact table M times with per-entity key offsets so
referential integrity is preserved copy-by-copy (each copy's orders
point at that copy's customers, etc.).  Dimension tables (region,
nation) keep their fixed TPC-H-style cardinality — scale factor does
not multiply dimensions.  Payload columns are copied verbatim, so
derived invariants (n_chars == len(text)) keep holding.

Used by tools/scale_smoke.py to build an sf1-equivalent (10x sf0.1)
corpus for the one-shot scale smoke (VERDICT r4 advice #6) without
touching the read-only /root/testdata.

Usage: python tools/make_sf.py [SRC] [DST] [MULT]
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {column: offset-entity}; every key column of one entity
# shifts by the same per-copy offset on both sides of each FK
ENTITY_KEYS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
# where each entity's offset is measured (max key + 1 in the source)
ENTITY_SOURCE = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
DIMS = ["region", "nation"]


def make_sf(src: str, dst: str, mult: int) -> dict[str, int]:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    offsets = {
        ent: con.sql(f"SELECT max({col}) + 1 FROM "
                     f"read_parquet('{src}/{tbl}.parquet')").fetchone()[0]
        for ent, (tbl, col) in ENTITY_SOURCE.items()
    }
    counts: dict[str, int] = {}
    for t in DIMS:
        con.sql(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        counts[t] = con.sql(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
    for t, keycols in ENTITY_KEYS.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        sel = ", ".join(
            f"CAST({c} + k.k * {offsets[keycols[c]]} AS "
            f"{'BIGINT' if c not in ('l_linenumber',) else 'INTEGER'}) AS {c}"
            if c in keycols else c
            for c in cols)
        con.sql(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet') "
            f"CROSS JOIN (SELECT * FROM range({mult}) t(k)) k) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 122880)")
        counts[t] = con.sql(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
    return counts


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jesse_spark_sf1"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    for t, n in make_sf(src, dst, mult).items():
        print(f"{t}: {n} rows")
