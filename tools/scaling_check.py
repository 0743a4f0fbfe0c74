#!/usr/bin/env python3
"""Dev-side scaling comparator: joins two graft.Bench artifacts taken at
different scale factors (same host window, same code) into a per-query
scaling report.

Usage: scaling_check.py <bench_small.json> <bench_large.json> <rows_ratio> <out_json>

<rows_ratio> is the input-size multiple between the two runs (10 for
sf0.1 -> sf1). For every common query key the report records
t_large / t_small; the interesting classification is against rows_ratio:

- a data-parallel linear operator should land AT or BELOW rows_ratio
  (below, because each cell also carries fixed plan/JIT/trigger overhead
  that does not grow with the data — at sf0.1 most catalog cells are
  overhead-dominated, so ratios well under 10 are the healthy norm);
- a cell ABOVE `flag_factor * rows_ratio` (default 1.2, i.e. ratio > 12
  for a 10x sweep) is a super-linear suspect: something in it grows
  faster than the input — pair-expansion without a cap, a join whose
  output is quadratic in a key's frequency, state that should have been
  evicted, a sort that stopped fitting, a broadcast that crossed its
  gate. Every flagged cell must end up either FIXED or attributed in
  SCALE.md (output growth that is genuinely super-linear in the input,
  e.g. a self-join whose result set is quadratic by definition).

`--prev <prior SCALING_r*.json>` adds a mechanical round-over-round
comparison ON THE RATIOS (r15 verdict task 9): a cell's scaling ratio is
host-drift-resistant (both legs run in the same window, so drift
cancels), which makes ratio regressions machine-flaggable the way
BENCH_FULL's vs_prev_round made wall regressions flaggable. The report
gains `vs_prev_round` with the prior artifact's name, the per-cell
ratio-of-ratios for every common cell, and a `ratio_regressions` list of
cells whose scaling ratio grew by more than `--prev-flag` (default 1.5×)
AND whose current ratio exceeds half the flag threshold (a 0.2→0.4
ratio jump on an overhead-dominated sub-second cell is noise, not a
plan bend), OR whose ratio-of-ratios exceeds RR_HARD (3×) regardless of
the absolute-ratio floor — a multiplicative bend that large is
structural at any absolute ratio (the r16 q_stream_histogram gap: rr
5.01 ducked under the half-threshold gate because 5.81 < 6).

Failed cells (-1.0) on either side are reported separately and never
ratio'd. A flagged cell whose growth is quadratic BY CONSTRUCTION (an
oracle-mode configuration that deliberately runs the provable exact
shape, e.g. nlist=1 full pairwise cosine) is attributed, not fixed:
pass `--attr <json>` with {"query": "reason"} and the report carries the
reason in `flagged[query].attribution` and counts it under
`n_flagged_attributed` instead of `n_flagged_open`. An OPEN flag (no
attribution) is a real super-linear suspect and must end up fixed.
Dev tooling only (like tools/oracle_check.py) — the library
never imports this.
"""
import json
import sys

# Secondary ratio-regression trigger: a cell whose scaling ratio grew by
# more than this factor round-over-round is flagged even when its absolute
# ratio sits under the half-threshold floor (see the inline comment at the
# gate). Tested by tools/test_scaling_check.py.
RR_HARD = 3.0


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {k: v for k, v in d.get("queries", {}).items()}
    return d, qs


def main():
    argv = list(sys.argv[1:])
    attr = {}
    if "--attr" in argv:
        i = argv.index("--attr")
        with open(argv[i + 1]) as f:
            attr = json.load(f)
        del argv[i:i + 2]
    prev_path, prev_flag = None, 1.5
    if "--prev" in argv:
        i = argv.index("--prev")
        prev_path = argv[i + 1]
        del argv[i:i + 2]
    if "--prev-flag" in argv:
        i = argv.index("--prev-flag")
        prev_flag = float(argv[i + 1])
        del argv[i:i + 2]
    if len(argv) < 4:
        sys.exit(__doc__)
    small_path, large_path, rows_ratio, out = (
        argv[0], argv[1], float(argv[2]), argv[3])
    flag_factor = float(argv[4]) if len(argv) > 4 else 1.2
    ds, qs_small = load(small_path)
    dl, qs_large = load(large_path)
    common = sorted(set(qs_small) & set(qs_large))
    failed = sorted([k for k in common
                     if qs_small[k] < 0 or qs_large[k] < 0])
    cells = {}
    for k in common:
        if k in failed:
            continue
        ratio = qs_large[k] / qs_small[k] if qs_small[k] > 0 else None
        cells[k] = {"small_sec": round(qs_small[k], 3),
                    "large_sec": round(qs_large[k], 3),
                    "ratio": round(ratio, 2) if ratio is not None else None}
    flagged = sorted(
        [k for k, c in cells.items()
         if c["ratio"] is not None and c["ratio"] > flag_factor * rows_ratio],
        key=lambda k: -cells[k]["ratio"])
    tot_s = sum(qs_small[k] for k in cells)
    tot_l = sum(qs_large[k] for k in cells)
    report = {
        "small": {"path": small_path, "sf": ds.get("sf"),
                  "total_sec": round(tot_s, 1)},
        "large": {"path": large_path, "sf": dl.get("sf"),
                  "total_sec": round(tot_l, 1)},
        "rows_ratio": rows_ratio,
        "flag_threshold": round(flag_factor * rows_ratio, 2),
        "n_common": len(common),
        "n_failed": len(failed),
        "failed": failed,
        "aggregate_ratio": round(tot_l / tot_s, 2) if tot_s else None,
        "n_flagged": len(flagged),
        "n_flagged_attributed": len([k for k in flagged if k in attr]),
        "n_flagged_open": len([k for k in flagged if k not in attr]),
        "flagged": {k: dict(cells[k], **({"attribution": attr[k]}
                                         if k in attr else {}))
                    for k in flagged},
        "queries": cells,
    }
    # aggregate with the attributed (quadratic-by-construction) cells
    # removed — the honest linear-path scaling number
    lin = [k for k in cells if k not in attr]
    ts, tl = sum(qs_small[k] for k in lin), sum(qs_large[k] for k in lin)
    report["aggregate_ratio_excl_attributed"] = (
        round(tl / ts, 2) if ts else None)
    if prev_path:
        with open(prev_path) as f:
            prev = json.load(f)
        pq = prev.get("queries", {})
        ror = {}   # ratio-of-ratios per common cell
        regressions = {}
        for k, c in cells.items():
            p = pq.get(k, {}).get("ratio")
            if p is None or c["ratio"] is None or p <= 0:
                continue
            rr = round(c["ratio"] / p, 2)
            ror[k] = rr
            # a real bend: the scaling ratio grew AND the cell now sits in
            # super-linear territory (> half the flag line) — overhead-
            # dominated sub-linear cells jitter freely below it.
            # SECONDARY trigger (r16 verdict): rr > RR_HARD flags
            # REGARDLESS of the absolute-ratio floor — r16's
            # q_stream_histogram bent 1.16→5.81×/decade (rr 5.01, the
            # artifact's largest movement) yet ducked under the half-
            # threshold gate because 5.81 < 6; a >3× multiplicative bend
            # is structural at any absolute ratio and must be adjudicated.
            if ((rr > prev_flag and
                 c["ratio"] > flag_factor * rows_ratio / 2) or
                    rr > RR_HARD):
                regressions[k] = {"prev_ratio": p, "ratio": c["ratio"],
                                  "ratio_of_ratios": rr}
        report["vs_prev_round"] = {
            "prev": prev_path,
            "prev_flag": prev_flag,
            "n_common": len(ror),
            "n_ratio_regressions": len(regressions),
            "ratio_regressions": regressions,
            "ratio_of_ratios": ror,
        }
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=False)
    print(f"{len(common)} common keys, {len(failed)} failed, "
          f"aggregate {report['aggregate_ratio']}x at rows x{rows_ratio:g}; "
          f"{len(flagged)} flagged > {report['flag_threshold']}x")
    for k in flagged:
        c = cells[k]
        tag = "ATTRIBUTED" if k in attr else "OPEN"
        print(f"  FLAG [{tag}] {k}: {c['small_sec']}s -> {c['large_sec']}s "
              f"= {c['ratio']}x")
    vp = report.get("vs_prev_round")
    if vp:
        print(f"vs {vp['prev']}: {vp['n_common']} common ratios, "
              f"{vp['n_ratio_regressions']} ratio regressions "
              f"(> {prev_flag}x ratio-of-ratios AND super-linear-adjacent)")
        for k, r in vp["ratio_regressions"].items():
            print(f"  RATIO-REGRESSION {k}: {r['prev_ratio']}x -> "
                  f"{r['ratio']}x ({r['ratio_of_ratios']}x)")
    sys.exit(0)


if __name__ == "__main__":
    main()
