#!/usr/bin/env python3
"""Dev-side DuckDB oracle comparator (the driver's check, reusable locally).

Usage: oracle_check.py <results_dir> <tables_dir> <out_json> [label]

<results_dir> is a graft.Verify output directory (per-query parquet dirs +
oracle_sql.json). Every oracle is run in DuckDB against the parquet tables
in <tables_dir>; each query's result is compared as a sorted-by-all-columns
frame with columns sorted by name (the driver's convention). Writes a JSON
summary to <out_json> and exits non-zero on any mismatch.

GRAFT_ORACLE_TIMEOUT=<seconds> bounds each ORACLE query (the Spark results
are already materialized parquet): a timed-out oracle is recorded as
"excluded" with the elapsed bound rather than a mismatch — the sf1-sweep
convention for quadratic oracles (e.g. q_fuzzy_join's cross join) that are
affordable at sf0.01 but pathological at 10×. Excluded cells don't count
toward n/n_match; they land in the artifact's "excluded" map so every skip
is named with its reason.

Dev tooling only (like tools/gen_soak_sf1.py) — the library never imports
this; DuckDB/pandas are the driver-side oracle stack.
"""
import json
import math
import os
import sys
import threading

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def sort_repr(v):
    # floats are keyed at 9 significant digits so two values equal within
    # cells_equal's 1e-9 slack sort to the SAME position in both frames —
    # a raw str() key would misalign rows like 0.0001 vs 1.0000000000001e-4
    if isinstance(v, float) and not math.isnan(v):
        return f"{v:.8e}"
    return str(v)


def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    key = df.apply(lambda r: tuple(sort_repr(v) for v in r), axis=1)
    return df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        # driver compares hashes of rounded reprs; allow 1e-9 relative slack
        # so a genuinely-equal float that prints differently doesn't flag
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)


def compare(s, o):
    if sorted(s.columns) != sorted(o.columns):
        return f"schema: result={sorted(s.columns)} oracle={sorted(o.columns)}"
    if len(s) != len(o):
        return f"rows: result={len(s)} oracle={len(o)}"
    s, o = norm(s), norm(o)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not cells_equal(a, b):
                return f"value: col={c} row={i} result={a!r} oracle={b!r}"
    return None


def main():
    results_dir, tables_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    label = sys.argv[4] if len(sys.argv) > 4 else results_dir
    con = duckdb.connect()
    for t in TABLES:
        p = f"{tables_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{results_dir}/oracle_sql.json"))
    timeout = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)

    def run_oracle(sql, _retry=True):
        # duckdb has no statement timeout; interrupt from a watchdog thread
        # and surface the cancellation as a distinguishable exception
        if timeout <= 0:
            return con.sql(sql).df()
        import time
        t0 = time.monotonic()
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            return con.sql(sql).df()
        except duckdb.InterruptException:
            # a stale interrupt from the PREVIOUS query's watchdog (fired in
            # the gap between its df() return and cancel) lands here early —
            # retry once; a genuine timeout has elapsed >= the bound
            if _retry and time.monotonic() - t0 < timeout * 0.5:
                return run_oracle(sql, _retry=False)
            raise TimeoutError(f"oracle exceeded {timeout:.0f}s")
        finally:
            timer.cancel()

    ran = sorted(d for d in os.listdir(results_dir)
                 if os.path.isdir(os.path.join(results_dir, d)))
    out = {"label": label, "tables": tables_dir, "queries": {}, "n": 0,
           "n_match": 0, "excluded": {}}
    for name in ran:
        entry = {}
        try:
            s = con.sql(
                f"SELECT * FROM '{results_dir}/{name}/*.parquet'").df()
            if "__graft_query_error" in s.columns:
                entry["err"] = str(s.iloc[0, 0])[:300]
                raise RuntimeError(entry["err"])
            if name not in oracle:
                # driver parity: no oracle entry -> the weaker rows>0 check
                # (an intentionally-empty result would need a real oracle)
                entry["rows"] = len(s)
                entry["match"] = bool(len(s) > 0)
                entry["rows_only"] = True
            else:
                o = run_oracle(oracle[name])
                diff = compare(s, o)
                entry["rows"] = len(s)
                entry["match"] = diff is None
                if diff:
                    entry["diff"] = diff
        except TimeoutError as e:
            # the SPARK result completed; only the ORACLE is unaffordable —
            # an exclusion (named, with reason), never a silent pass/fail
            out["excluded"][name] = str(e)
            print(f"[oracle_check] {name}: EXCLUDED ({e})")
            continue
        except Exception as e:  # noqa: BLE001 — record and continue
            entry.setdefault("err", str(e)[:300])
            entry["match"] = False
        out["n"] += 1
        out["queries"][name] = entry
        if entry["match"]:
            out["n_match"] += 1
        print(f"[oracle_check] {name}: "
              f"{'MATCH' if entry['match'] else 'MISMATCH ' + str(entry.get('diff', entry.get('err', '')))}")
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"[oracle_check] {out['n_match']}/{out['n']} match -> {out_json}")
    sys.exit(0 if out["n_match"] == out["n"] else 1)


if __name__ == "__main__":
    main()
