#!/usr/bin/env python
"""Deterministic sf1-class scale-up of the driver's sf0.1 testdata.

Replicates every /root/testdata/sf0.1 table K=10 times into
``.localdata/sf1`` (inside the repo — /root/testdata is read-only),
offsetting every key column per replica so referential integrity is
preserved (an order's lineitems follow it into the same replica).
Pure function of the sf0.1 input — no RNG, no timestamps — so repeated
runs are byte-stable.

Semantics-preserving perturbations:
- ``documents.text`` gets a short replica-specific suffix for r>0 so
  the corpus does not become 10 exact copies of itself (which would
  turn the dedup benchmarks into a degenerate everything-is-a-dup
  run); near-dup structure *within* a replica is untouched.
- ``embeddings.embedding`` is scaled by (1 + r*1e-4) per replica —
  cosine structure preserved, exact-duplicate vectors avoided.

Usage: python scripts/gen_sf1.py [K] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1")
)

# key offsets chosen far above any sf0.1 max key
O_ORDER = 1_000_000_000
O_PART = 10_000_000
O_SUPP = 100_000
O_CUST = 10_000_000
O_EVENT = 1_000_000_000
O_USER = 10_000_000
O_DOC = 1_000_000_000
O_VEC = 1_000_000_000

TABLES: dict[str, str] = {
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": f"""
        SELECT c_custkey + r * {O_CUST} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM src CROSS JOIN range({K}) reps(r)""",
    "supplier": f"""
        SELECT s_suppkey + r * {O_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM src CROSS JOIN range({K}) reps(r)""",
    "part": f"""
        SELECT p_partkey + r * {O_PART} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM src CROSS JOIN range({K}) reps(r)""",
    "orders": f"""
        SELECT o_orderkey + r * {O_ORDER} AS o_orderkey,
               o_custkey + r * {O_CUST} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src CROSS JOIN range({K}) reps(r)""",
    "lineitem": f"""
        SELECT l_orderkey + r * {O_ORDER} AS l_orderkey,
               l_partkey + r * {O_PART} AS l_partkey,
               l_suppkey + r * {O_SUPP} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM src CROSS JOIN range({K}) reps(r)""",
    "events": f"""
        SELECT event_id + r * {O_EVENT} AS event_id, ts,
               user_id + r * {O_USER} AS user_id, event_type, value, props
        FROM src CROSS JOIN range({K}) reps(r)""",
    "documents": f"""
        SELECT doc_id + r * {O_DOC} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE text || ' rep' || r || 'x' || (doc_id % 97) END AS text,
               lang, source,
               CASE WHEN r = 0 THEN n_chars
                    ELSE length(text || ' rep' || r || 'x' || (doc_id % 97)) END
                   AS n_chars
        FROM src CROSS JOIN range({K}) reps(r)""",
    "embeddings": f"""
        SELECT vec_id + r * {O_VEC} AS vec_id,
               CAST(list_transform(embedding,
                    x -> CAST(x * (1.0 + r * 0.0001) AS FLOAT)) AS FLOAT[])
                   AS embedding,
               label
        FROM src CROSS JOIN range({K}) reps(r)""",
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for name, sql in TABLES.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{name}.parquet'")
        dest = os.path.join(OUT, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{name}: {n} rows -> {dest}")


if __name__ == "__main__":
    main()
