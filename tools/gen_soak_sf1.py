#!/usr/bin/env python3
"""Deterministic soak-input generator for `graft.Soak` (~sf1 by default).

Dev-side tooling only (DuckDB, like the driver's oracle) -- the library
itself never touches this. Writes under /tmp/soak_sf1, NEVER under
/root/testdata. Each table is 10 replicas of its /root/testdata/sf0.1
original with disjoint key spaces, keyed to lineitem's existing replica
offset (i * 150000 on the order-key axis) so cross-table joins stay
consistent:

  - lineitem  : baskets replicate (l_orderkey + i*150000), part keys kept
                -- pair density rises, the harder direction for the
                co-purchase family (see SCALE.md round-8 notes);
  - orders    : o_orderkey + i*150000, o_custkey + i*15000 -- 10 disjoint
                replicas of the customer->order graph;
  - events    : event_id + i*100000, user_id + i*1500, timestamps kept --
                10x users over the SAME month, so per-user session/window
                shapes stay constant while window-key cardinality grows 10x;
  - documents : replica 0 intact (preserves the original near-dup pairs);
                replicas 1-9 mutate every 3rd word with a replica salt, so
                replicas are NOT near-dups of each other and near-dup
                density stays constant at 10x the corpus;
  - embeddings: replica 0 intact (preserves the original near-dup pairs
                and cluster structure); replicas 1+ get a deterministic
                per-(replica, dim) SIGN pattern — norms preserved exactly,
                direction scrambled, so replicas are NOT cosine near-dups
                of each other or of the original and near-dup pair volume
                stays replica-0-sized at any R. (The original constant-
                shift jitter left replicas at cosine ~0.99997, an R-clique
                per vector — quadratic-in-R pair volume that poisoned the
                scaling watch for the similarity pipelines.)

Idempotent: only generates tables that are missing or whose column list
drifted from the current sf0.1 schema (the driver regenerates testdata
between rounds; a soak table carrying a stale schema is silently wrong
for every consumer). --force regenerates everything.

--replicas N --dst DIR generate other scales with the same disjoint-key
construction (e.g. --replicas 100 --dst /tmp/soak_sf10 for the 100x
tables behind the three-point scaling fit in SCALE.md). Key offsets are
replica-indexed, so any N keeps cross-table joins consistent.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def _cli(flag, default):
    import sys
    if flag in sys.argv:
        i = sys.argv.index(flag)
        if i + 1 >= len(sys.argv):
            sys.exit(f"{flag} needs a value\n\n{__doc__}")
        return sys.argv[i + 1]
    return default


DST = _cli("--dst", "/tmp/soak_sf1")
R = int(_cli("--replicas", "10"))

con = duckdb.connect()


def columns(path):
    return [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()]


def count(path):
    return con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]


def stale(table, replicas=1):
    dst = f"{DST}/{table}.parquet"
    if not os.path.exists(dst):
        return "missing"
    if columns(dst) != columns(f"{SRC}/{table}.parquet"):
        return "schema drift"
    # the replica count is part of the table's identity now that it is
    # configurable: a dst dir populated at another scale must regenerate,
    # or a 100x leg silently measures 10x rows
    want = count(f"{SRC}/{table}.parquet") * replicas
    if count(dst) != want:
        return f"row count {count(dst)} != src x {replicas} = {want}"
    return None


def emit(table, select_sql):
    tmp = f"{DST}/.{table}.tmp.parquet"
    con.execute(f"COPY ({select_sql}) TO '{tmp}' (FORMAT PARQUET)")
    os.replace(tmp, f"{DST}/{table}.parquet")  # atomic same-fs publish
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"generated {table}: {n} rows")


GEN = {
    # passthrough replication with disjoint key spaces
    "lineitem": f"""
        SELECT l_orderkey + r.i * 150000 AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', range({R}) r(i)""",
    "orders": f"""
        SELECT o_orderkey + r.i * 150000 AS o_orderkey,
               o_custkey + r.i * 15000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', range({R}) r(i)""",
    "events": f"""
        SELECT event_id + r.i * 100000 AS event_id, ts,
               user_id + r.i * 1500 AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet', range({R}) r(i)""",
    # replica 0 intact; replicas 1-9 salt every 3rd word so the 10x corpus
    # keeps the ORIGINAL near-dup pairs and gains no cross-replica ones
    "documents": f"""
        SELECT doc_id + r.i * 100000 AS doc_id,
               CASE WHEN r.i = 0 THEN text ELSE (
                 SELECT string_agg(
                   CASE WHEN w.n % 3 = 0
                        THEN w.word || 'x' || CAST(r.i AS VARCHAR)
                        ELSE w.word END, ' ' ORDER BY w.n)
                 FROM (SELECT unnest(string_split(text, ' ')) AS word,
                              generate_subscripts(string_split(text, ' '), 1) AS n) w
               ) END AS text,
               lang, source, n_chars
        FROM '{SRC}/documents.parquet', range({R}) r(i)""",
    # replica 0 intact; replicas 1+ sign-scramble per (replica, dim): the
    # pattern ((i*37 + d*11 + i*d*7) % 101) % 2 has an i×d cross term, so
    # two distinct replicas differ on ~half the dims (the i−j difference
    # (37+7d) mod 101 sweeps residues as d varies; 101 > any sane R keeps
    # i−j from ever vanishing mod 101) → pairwise cosine ~0, norms exact
    "embeddings": f"""
        SELECT vec_id + r.i * 100000 AS vec_id,
               CASE WHEN r.i = 0 THEN embedding ELSE
                 list_transform(range(1, len(embedding) + 1),
                   d -> CAST(embedding[d] *
                        (CASE WHEN (r.i * 37 + d * 11 + r.i * d * 7) % 101 % 2 = 0
                              THEN 1.0 ELSE -1.0 END) AS FLOAT))
               END AS embedding, label
        FROM '{SRC}/embeddings.parquet', range({R}) r(i)""",
}


# dimension tables are copied verbatim -- they are fixed-cardinality in
# TPC-H terms at any SF, and the dimension-driven pipelines (pagerank over
# the nation graph, broadcast joins) read them from the same directory
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main():
    force = "--force" in sys.argv
    os.makedirs(DST, exist_ok=True)
    for table in DIMS:
        why = "forced" if force else stale(table)
        if why is None:
            print(f"keep {table} (fresh)")
            continue
        print(f"copy {table} ({why})")
        emit(table, f"SELECT * FROM '{SRC}/{table}.parquet'")
    for table, sql in GEN.items():
        why = "forced" if force else stale(table, replicas=R)
        if why is None:
            print(f"keep {table} (fresh)")
            continue
        print(f"regen {table} ({why})")
        emit(table, sql)


if __name__ == "__main__":
    main()
