"""Materialize an sf1-scale dataset by replicating sf0.1 K-fold with
key remapping (default K=10), preserving the driver dataset's layout:
one parquet FILE per table, so both Spark and DuckDB read it the same
way and the oracle sweep can run unmodified at the larger scale.

Replication discipline (same rules as scripts/scale_curve.py, which
feeds DataFrames rather than files):

* join keys are offset per replica so every join keeps its original
  1:N shape (l_orderkey/o_orderkey move together; o_custkey/c_custkey
  move together) — no cross-replica matches, no accidental
  cross-products;
* documents get a per-replica prefix on EVERY token, so replicas share
  no shingles and MinHash/SimHash bucket sizes stay natural;
* events get disjoint user/event ids per replica (sessionization and
  per-user stats see K independent populations);
* embeddings get remapped vec_ids (scoring cost is linear in corpus
  rows; vector values don't change the work);
* dimension tables (region, nation, supplier, part, customer is NOT a
  dimension here — it replicates with orders) are copied as-is, so
  fact→dim joins fan in K× like a real scale-up.

Per-group aggregate magnitudes genuinely grow ~K× (e.g. tpch_q1 sums),
which is the point: the sf0.1 oracle sweep caught a >2^53 divergence
the sf0.01 gate could not see; sf1 probes the next decade.

Usage: python scripts/make_sf1.py [dst_dir] [K]
  or   from make_sf1 import make_sf1; make_sf1(dst, k=10)
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: replica offsets — far above every sf0.1 key's range, far below 2^53
OFF = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "doc_id": 10_000_000,
    "event_id": 1_000_000_000,
    "user_id": 10_000_000,
    "vec_id": 10_000_000,
}

COPY_AS_IS = ["region", "nation", "supplier", "part"]


def make_sf1(dst: str, k: int = 10, src: str = SRC) -> str:
    """Write the K-fold scaled tables into ``dst`` and return it."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")

    def rel(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    def copy(select: str, table: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{dst}/{table}.parquet' "
            "(FORMAT PARQUET, COMPRESSION ZSTD)"
        )

    r = f"range({k}) reps(r)"
    copy(
        f"""SELECT l_orderkey + r * {OFF['orderkey']} AS l_orderkey,
        l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {rel('lineitem')}, {r}""",
        "lineitem",
    )
    copy(
        f"""SELECT o_orderkey + r * {OFF['orderkey']} AS o_orderkey,
        o_custkey + r * {OFF['custkey']} AS o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {rel('orders')}, {r}""",
        "orders",
    )
    copy(
        f"""SELECT c_custkey + r * {OFF['custkey']} AS c_custkey,
        c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {rel('customer')}, {r}""",
        "customer",
    )
    copy(
        f"""SELECT event_id + r * {OFF['event_id']} AS event_id, ts,
        user_id + r * {OFF['user_id']} AS user_id, event_type, value, props
        FROM {rel('events')}, {r}""",
        "events",
    )
    # every token (and the doc head) gets the replica salt so replicas
    # share no shingles; n_chars is recomputed for the salted text
    copy(
        f"""SELECT doc_id + r * {OFF['doc_id']} AS doc_id,
        'r' || r || '_' || replace(text, ' ', ' r' || r || '_') AS text,
        lang, source,
        CAST(len('r' || r || '_' ||
                 replace(text, ' ', ' r' || r || '_')) AS BIGINT) AS n_chars
        FROM {rel('documents')}, {r}""",
        "documents",
    )
    copy(
        f"""SELECT vec_id + r * {OFF['vec_id']} AS vec_id, embedding, label
        FROM {rel('embeddings')}, {r}""",
        "embeddings",
    )
    for t in COPY_AS_IS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con.close()
    return dst


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shaha_sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    make_sf1(dst, k)
    import duckdb

    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "events", "documents",
              "embeddings"] + COPY_AS_IS:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t:<12} {n:>12,}")
