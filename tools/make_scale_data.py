"""Tile the driver's sf0.1 test tables into a larger self-baseline scale
factor (default 10x ~= "sf1.0") for scaling-ratio benchmarking.

The driver only ships sf{0.001,0.01,0.1}; the scaling question we need
answered ("which query's sf0.1 -> sf1.0 wall-clock ratio is super-linear?")
just needs MORE data with the SAME distributions and intact FK structure,
so each replica i shifts every surrogate key by ``i * KEY_OFFSET`` (joins
stay within-replica, selectivities preserved) while the fixed dimensions
(region, nation) are copied once:

* orders/lineitem/customer/supplier/part: keys + FKs shifted together;
* events: event_id/user_id shifted, timestamps kept (per-user session and
  window distributions replicate exactly);
* documents: doc_id shifted; replica 0 is verbatim, replicas >0 get a
  ``" repI"`` suffix so each replica keeps sf0.1's internal duplicate
  structure WITHOUT making every doc a 10-way cross-replica exact dup
  (which would measure pair-explosion, not engine scaling);
* embeddings: vec_id shifted; the vector is circularly shifted by i
  dimensions — norms and within-replica pairwise distances are preserved,
  cross-replica collapse is avoided, and replica 0 keeps the query
  vectors the bench uses verbatim.

Pure DuckDB (no Spark) so it can run next to a busy JVM. Usage:

    python tools/make_scale_data.py --out /tmp/sf1.0 [--replicas 10]
    SPARK_GRAFT_SF_DIR=/tmp/sf1.0 python bench.py
"""

from __future__ import annotations

import argparse
import os

import duckdb

KEY_OFFSET = 10_000_000

#: per-table SELECT template; {off} is the replica key offset expression.
_TEMPLATES = {
    "customer": (
        "SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment FROM t"
    ),
    "supplier": (
        "SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey, "
        "s_acctbal FROM t"
    ),
    "part": (
        "SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type, "
        "p_size, p_retailprice FROM t"
    ),
    "orders": (
        "SELECT o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS "
        "o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
        "o_orderpriority FROM t"
    ),
    "lineitem": (
        "SELECT l_orderkey + {off} AS l_orderkey, l_partkey + {off} AS "
        "l_partkey, l_suppkey + {off} AS l_suppkey, l_linenumber, "
        "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate FROM t"
    ),
    "events": (
        "SELECT event_id + {off} AS event_id, ts, user_id + {off} AS "
        "user_id, event_type, value, props FROM t"
    ),
    "documents": (
        "SELECT doc_id + {off} AS doc_id, "
        "CASE WHEN {i} = 0 THEN text ELSE text || ' rep{i}' END AS text, "
        "lang, source, "
        "CASE WHEN {i} = 0 THEN n_chars ELSE n_chars + len(' rep{i}') END "
        "AS n_chars FROM t"
    ),
    "embeddings": (
        "SELECT vec_id + {off} AS vec_id, "
        "CASE WHEN {i} = 0 THEN embedding ELSE "
        "list_concat(embedding[{i}+1:], embedding[:{i}])::FLOAT[] END "
        "AS embedding, label FROM t"
    ),
}

_COPY_ONCE = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1.0")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for table in _COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{table}.parquet')) "
            f"TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")
    for table, tmpl in _TEMPLATES.items():
        con.execute(
            f"CREATE OR REPLACE VIEW t AS "
            f"SELECT * FROM read_parquet('{args.src}/{table}.parquet')"
        )
        selects = " UNION ALL ".join(
            tmpl.format(off=i * KEY_OFFSET, i=i) for i in range(args.replicas)
        )
        con.execute(
            f"COPY ({selects}) TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({args.replicas} replicas)")


if __name__ == "__main__":
    main()
