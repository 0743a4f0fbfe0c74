#!/usr/bin/env python3
"""Join a local[32] control Bench run and a local-cluster Bench run into
BENCH_CLUSTER.json — the multi-JVM performance evidence.

Usage: bench_cluster_join.py <local_full.json> <cluster_full.json> <out.json> <label> <deploy>

Both inputs are Bench SPARK_GRAFT_FULL_OUT artifacts produced back-to-back
in one host window (the drift discipline in SCALE.md). The drift adjustment
follows the r14 protocol: the cache-free controls panel's cluster/local
ratio is taken as the per-run constant (window drift + fixed cross-JVM
dispatch), and ratio_drift_adjusted divides it out of the raw total ratio.
Cells over 2x are listed with the sub-second-constant attribution when the
local absolute is under 1 s; anything slower lands unattributed for manual
adjudication. Dev tooling only — the library never imports this.
"""
import json
import sys

CONTROLS = ["nx_q1", "q_char_lm", "q_ngram_lm", "q_cluster_split",
            "q_pagerank", "q_triangles"]

SUBSEC_ATTR = ("sub-second absolute cell; the delta is the fixed cross-JVM "
               "task-dispatch/result-fetch constant, not a serialization or "
               "broadcast pathology")


def load(path):
    d = json.load(open(path))
    return d["queries_full"] if "queries_full" in d else d["queries"], d


def main():
    local_path, cluster_path, out_path, label, deploy = sys.argv[1:6]
    lq, ld = load(local_path)
    cq, cd = load(cluster_path)
    common = sorted(set(lq) & set(cq))
    cells = {k: {"local": round(lq[k], 3), "cluster": round(cq[k], 3),
                 "ratio": round(cq[k] / lq[k], 2) if lq[k] > 0 else None}
             for k in common}
    local_sec = round(sum(lq[k] for k in common), 1)
    cluster_sec = round(sum(cq[k] for k in common), 1)
    ratio = round(cluster_sec / local_sec, 2)
    ctl = [c for c in CONTROLS if c in common]
    ctl_l = sum(lq[c] for c in ctl)
    ctl_c = sum(cq[c] for c in ctl)
    ctl_ratio = round(ctl_c / ctl_l, 3)
    heavy = [k for k in common if lq[k] >= 1.5]
    heavy_ratios = sorted(cells[k]["ratio"] for k in heavy)
    heavy_summary = {
        "n": len(heavy),
        "max_ratio": heavy_ratios[-1] if heavy else None,
        "median_ratio": heavy_ratios[len(heavy_ratios) // 2] if heavy else None,
    }
    over2 = []
    for k in common:
        if cells[k]["ratio"] is not None and cells[k]["ratio"] > 2:
            entry = {"query": k, **cells[k]}
            if lq[k] < 1.0:
                entry["attribution"] = SUBSEC_ATTR
            over2.append(entry)
    out = {
        "label": label,
        "deploy": deploy,
        "local_sec": local_sec,
        "cluster_sec": cluster_sec,
        "ratio": ratio,
        "ratio_drift_adjusted": round(ratio / ctl_ratio, 3),
        "controls": {"cells": ctl, "local_sec": round(ctl_l, 3),
                     "cluster_sec": round(ctl_c, 3), "ratio": ctl_ratio},
        "queries_run": len(common),
        "failed": (ld.get("failed", 0) or 0) + (cd.get("failed", 0) or 0),
        "heavy_cells_ge_1p5s": heavy_summary,
        "cells_over_2x": over2,
        "queries": cells,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    unattributed = [e["query"] for e in over2 if "attribution" not in e]
    print(f"{out_path}: {len(common)} cells, raw {ratio}x, drift-adjusted "
          f"{out['ratio_drift_adjusted']}x; heavy max {heavy_summary['max_ratio']}x; "
          f">2x cells {len(over2)} ({len(unattributed)} need adjudication: {unattributed})")


if __name__ == "__main__":
    main()
