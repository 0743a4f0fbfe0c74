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
                and cluster structure); replicas 1+ each get a verified
                SIGNED PERMUTATION of the dims (orthogonal map — norms
                preserved exactly) so same-base replica pairs are
                statistically indistinguishable from fresh random draws
                of this corpus: replicas add no STRUCTURED near-dup pairs
                at any R. See the comment block above `verified_scramble`
                for the two prior failure modes (constant-shift jitter:
                cos ~0.99997 R-cliques; LCG sign pattern: replica 85
                bit-identical to replica 0) and why sign flips without a
                permutation still leave a 60x-natural near-dup rate.

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

# Replica scrambling = one SIGNED PERMUTATION per replica (permute dims,
# then flip signs) -- an orthogonal map, so norms are preserved EXACTLY.
# Why both parts are necessary (failure history):
#   - constant-shift jitter (round <14): replicas at cosine ~0.99997 --
#     an R-clique per vector, pair volume quadratic in R by data;
#   - LCG sign pattern (round 14): per-dim step (11+7i) vanishes mod 101
#     at i=85 -> replica 85 bit-identical to replica 0, ~27 other pairs
#     near-dup on EVERY base vector;
#   - hash signs alone (measured this round): same-base replicas share
#     per-dim MAGNITUDES, so the pair cosine is sum_d w_d s_i s_j with
#     w_d = e_d^2/||e||^2 concentrated on ~20 effective dims -> the
#     |cos| >= 0.4 rate is ~5.5% per (pair, vector), 60x the natural
#     cross-base rate of ~0.09%. 64 dims cannot keep C(R,2) sign-product
#     rows out of every vector's weighted tail.
# Permuting dims decorrelates the magnitude profiles too: measured at
# R=100 the same-base |cos| >= 0.4 rate is ~0.099% -- statistically
# identical to fresh random draws from this corpus, which is the
# invariant the scaling sweeps need (replicas add no STRUCTURED near-dup
# pairs; the corpus's own random tail is a base-data property either
# way). Signs are still greedily balanced pairwise (max uniform
# sign-agreement imbalance <= IMB_MAX < 0.4), and the final matrix is
# verified against the real corpus before use.
IMB_MAX = 0.3  # uniform sign-imbalance bound per row pair

# Bumped whenever the embeddings scramble construction changes. The
# staleness check can see schema/row-count drift but NOT a formula
# change (the round-14 LCG -> signed-permutation swap kept both), so the
# version is recorded in a sidecar next to the table and a mismatch
# forces regeneration instead of silently keeping a degenerate corpus.
SCRAMBLE_VERSION = "signed-perm-v1"


def _md5(*parts):
    import hashlib
    return hashlib.md5(":".join(str(p) for p in parts).encode()).digest()


def _sign_row(seed, salt, i, dims):
    return [1 if _md5("graft-soak-sign", seed, salt, i, d)[0] & 1 else -1
            for d in range(dims)]


def _perm_row(seed, i, dims):
    """Deterministic md5-driven Fisher-Yates permutation of 0..dims-1."""
    perm = list(range(dims))
    for d in range(dims - 1, 0, -1):
        j = int.from_bytes(_md5("graft-soak-perm", seed, i, d), "big") % (d + 1)
        perm[d], perm[j] = perm[j], perm[d]
    return perm


def sign_matrix(replicas, dims, seed=0):
    """Row 0 all +1; each later row greedily salted until its sign
    agreement with EVERY previously accepted row (including all-ones,
    i.e. its own balance) stays within IMB_MAX of 50/50 -- the
    constructive version of 'no two replicas share most sign flips'.
    Returns None when the greedy search exhausts its salt budget for a
    row (the caller advances to the next seed, which re-orders the
    accepted-row prefix and can succeed where this seed could not)."""
    limit = int(IMB_MAX * dims)
    rows = [[1] * dims]
    for i in range(1, replicas):
        for salt in range(20000):
            cand = _sign_row(seed, salt, i, dims)
            if all(abs(sum(a * b for a, b in zip(cand, prev))) <= limit
                   for prev in rows):
                rows.append(cand)
                break
        else:
            print(f"sign_matrix: seed {seed} exhausted at replica {i} "
                  f"(dims={dims}); trying next seed")
            return None
    return rows


def verified_scramble(replicas, src_embeddings):
    """Build (perm, sign) rows per replica and VERIFY them against the
    real corpus before use: for every replica pair (i, j) and every base
    vector e, the scrambled-copy cosine is
      |sum_d e[perm_i(d)] s_i(d) e[perm_j(d)] s_j(d)| / ||e||^2 .
    Asserts (retrying on the next seed if violated):
      (a) CLIQUE guard: no replica pair is a near-dup (>= minSim 0.4) for
          more than 1% of base vectors (the LCG degeneracy hit 100%;
          honest random pairs measure ~0.1%);
      (b) no recreated exact dups: global max |cos| < 0.95;
      (c) max uniform sign imbalance <= IMB_MAX (constructive, re-checked).
    Returns (perm_rows, sign_rows)."""
    import numpy as np
    raw = con.execute(
        f"SELECT embedding FROM '{src_embeddings}' "
        "WHERE embedding IS NOT NULL").fetchall()
    lens = {len(r[0]) for r in raw}
    if len(lens) != 1:
        sys.exit(f"embeddings are ragged ({sorted(lens)}); the signed "
                 "permutation needs a fixed dimensionality")
    dims = lens.pop()
    E = np.array([r[0] for r in raw], dtype=float)
    nrm2 = (E * E).sum(axis=1)
    E = E[nrm2 > 0]
    nrm2 = nrm2[nrm2 > 0]
    for seed in range(16):
        rows = sign_matrix(replicas, dims, seed=seed)
        if rows is None:
            continue
        S = np.array(rows)
        imb = 0.0
        for i in range(replicas):
            for j in range(i + 1, replicas):
                imb = max(imb, abs(int(S[i] @ S[j])) / dims)
        P = [np.arange(dims)] + [np.array(_perm_row(seed, i, dims))
                                 for i in range(1, replicas)]
        max_cos, max_frac = 0.0, 0.0
        for i in range(replicas):
            for j in range(i + 1, replicas):
                cos = np.abs((E[:, P[i]] * E[:, P[j]] * (S[i] * S[j]))
                             .sum(axis=1) / nrm2)
                max_cos = max(max_cos, float(cos.max()))
                max_frac = max(max_frac, float((cos >= 0.4).mean()))
        if max_frac <= 0.01 and max_cos < 0.95 and imb <= IMB_MAX:
            print(f"scramble: R={replicas} dims={dims} seed={seed} "
                  f"max clique frac={max_frac:.4f} (<=0.01), "
                  f"max |cos|={max_cos:.3f} (<0.95), "
                  f"max sign imbalance={imb:.3f} (<= {IMB_MAX})")
            return ([p.tolist() for p in P], S.astype(int).tolist())
        print(f"scramble: seed {seed} rejected (clique frac={max_frac:.4f},"
              f" max|cos|={max_cos:.3f}, imbalance={imb:.3f})")
    sys.exit("verified_scramble: no seed passed the corpus check")


def scramble_values_sql(replicas, src_embeddings):
    """DuckDB VALUES literal: (replica, INT[] 1-based perm, DOUBLE[] signs)."""
    perms, signs = verified_scramble(replicas, src_embeddings)
    return ", ".join(
        "({}, [{}], [{}])".format(
            i,
            ", ".join(str(p + 1) for p in perms[i]),
            ", ".join(f"{s}.0" for s in signs[i]))
        for i in range(replicas))


def columns(path):
    return [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()]


def count(path):
    return con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]


def genver_path(table):
    return f"{DST}/.{table}.genver"


def stale(table, replicas=1, genver=None):
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
    # schema and row count are blind to a generation-FORMULA change (the
    # LCG -> signed-permutation swap kept both), so formula-bearing
    # tables record their scheme version in a sidecar
    if genver is not None:
        try:
            have = open(genver_path(table)).read().strip()
        except OSError:
            have = "<none>"
        if have != genver:
            return f"generator scheme {have} != {genver}"
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
    # replica 0 intact; replicas 1+ get the verified SIGNED PERMUTATION
    # for that replica (see verified_scramble: md5-derived, clique- and
    # max-cosine-checked against this very corpus) -> norms exact,
    # magnitude profile AND direction scrambled, same-base replica pairs
    # statistically indistinguishable from fresh random draws. Lazy
    # (callable): the build + corpus verification only runs when the
    # embeddings table actually regenerates.
    "embeddings": lambda: f"""
        SELECT vec_id + r.i * 100000 AS vec_id,
               CASE WHEN r.i = 0 THEN embedding ELSE
                 list_transform(range(1, len(embedding) + 1),
                   d -> CAST(embedding[s.prm[d]] * s.sgn[d] AS FLOAT))
               END AS embedding, label
        FROM '{SRC}/embeddings.parquet', range({R}) r(i)
        JOIN (VALUES {scramble_values_sql(R, f"{SRC}/embeddings.parquet")})
          s(si, prm, sgn) ON s.si = r.i""",
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
        ver = SCRAMBLE_VERSION if table == "embeddings" else None
        why = "forced" if force else stale(table, replicas=R, genver=ver)
        if why is None:
            print(f"keep {table} (fresh)")
            continue
        print(f"regen {table} ({why})")
        emit(table, sql() if callable(sql) else sql)
        if ver is not None:
            with open(genver_path(table), "w") as f:
                f.write(ver + "\n")


if __name__ == "__main__":
    main()
