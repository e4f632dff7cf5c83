"""Generate an sf1-equivalent testdata directory by deterministic 10x
replication of the driver's sf0.1 parquet.

Purpose: SCALING.md's top measured step is sf0.1, where Spark's
0.2-0.4 s scheduling floor still dominates most queries; the heavy
tail (embedding/graph/coherence queries) needs one genuinely
volume-bound 10x step to turn "scale-safe by plan inspection" into a
measurement. This builds that step locally (the driver's generator is
not available in-container).

Construction, per replica r = 0..9 (r=0 is the original data bit for
bit):
- every primary/foreign key shifts by r * (max_key + 1), consistently
  across tables, so each replica is a self-consistent shard — joins
  keep their selectivity and the supplier/customer graphs grow 10x in
  nodes AND edges (10 components), which is how real corpora grow;
- document text rotates by r tokens (same length, same vocabulary,
  same token distribution) so the replicas are NOT 10 exact copies —
  a 10x exact-duplicate corpus would grow pairwise dedup output
  quadratically, which no real 10x corpus does;
- embeddings keep their vectors (distributional shape preserved);
- the nation/region dimensions stay as-is (dimensions don't scale).

    python tools/make_sf1.py [out_dir]   # default /root/repo/testdata_sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
REPLICAS = 10


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT unnest(range({REPLICAS})) AS rep")

    def src(t: str) -> str:
        return f"'{SRC}/{t}.parquet'"

    def emit(t: str, sql: str) -> None:
        con.sql(
            f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    # key spans (offset = rep * (max+1), replica-consistent)
    spans = {
        name: con.sql(
            f"SELECT MAX({key}) + 1 FROM {src(tbl)}"
        ).fetchone()[0]
        for name, (tbl, key) in {
            "C": ("customer", "c_custkey"),
            "S": ("supplier", "s_suppkey"),
            "P": ("part", "p_partkey"),
            "O": ("orders", "o_orderkey"),
            "E": ("events", "event_id"),
            "U": ("events", "user_id"),
            "D": ("documents", "doc_id"),
            "V": ("embeddings", "vec_id"),
        }.items()
    }
    C, S, P, O, E, U, D, V = (
        spans[k] for k in ["C", "S", "P", "O", "E", "U", "D", "V"]
    )

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {src(t)}")

    emit(
        "customer",
        f"SELECT c_custkey + rep * {C} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM {src('customer')} CROSS JOIN r",
    )
    emit(
        "supplier",
        f"SELECT s_suppkey + rep * {S} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM {src('supplier')} CROSS JOIN r",
    )
    emit(
        "part",
        f"SELECT p_partkey + rep * {P} AS p_partkey, p_name, p_brand, "
        f"p_type, p_size, p_retailprice FROM {src('part')} CROSS JOIN r",
    )
    emit(
        "orders",
        f"SELECT o_orderkey + rep * {O} AS o_orderkey, "
        f"o_custkey + rep * {C} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM {src('orders')} CROSS JOIN r",
    )
    emit(
        "lineitem",
        f"SELECT l_orderkey + rep * {O} AS l_orderkey, "
        f"l_partkey + rep * {P} AS l_partkey, "
        f"l_suppkey + rep * {S} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM {src('lineitem')} CROSS JOIN r",
    )
    emit(
        "events",
        f"SELECT event_id + rep * {E} AS event_id, ts, "
        f"user_id + rep * {U} AS user_id, event_type, value, props "
        f"FROM {src('events')} CROSS JOIN r",
    )
    emit(
        "documents",
        f"""
        SELECT doc_id + rep * {D} AS doc_id,
               CASE WHEN rep = 0 THEN text ELSE array_to_string(
                 list_concat(t[1 + (rep % greatest(len(t), 1)):],
                             t[:rep % greatest(len(t), 1)]), ' ')
               END AS text,
               lang, source,
               CAST(len(CASE WHEN rep = 0 THEN text ELSE array_to_string(
                 list_concat(t[1 + (rep % greatest(len(t), 1)):],
                             t[:rep % greatest(len(t), 1)]), ' ')
               END) AS BIGINT) AS n_chars
        FROM (SELECT *, string_split(coalesce(text, ''), ' ') AS t
              FROM {src('documents')}) CROSS JOIN r
        """,
    )
    emit(
        "embeddings",
        f"SELECT vec_id + rep * {V} AS vec_id, embedding, label "
        f"FROM {src('embeddings')} CROSS JOIN r",
    )


if __name__ == "__main__":
    main()
