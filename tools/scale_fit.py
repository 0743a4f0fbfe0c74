#!/usr/bin/env python3
"""Three-point scaling fit over graft.Soak artifacts (sf0.1, sf1, sf10).

Usage: scale_fit.py <soak_sf0.1.json> <soak_sf1.json> <soak_sf10.json>
                    <out.json> [flag_ratio] [--attr reasons.json]

Joins three soak sweeps taken at 1x / 10x / 100x input rows (same host
window, same code) into a per-pipeline scaling fit:

- r_decade1 = t(10x) / t(1x), r_decade2 = t(100x) / t(10x);
- alpha = log10(r_decade2): the TOP-decade wall-time exponent. The first
  decade is overhead-dominated at these absolute sizes (plan/JIT/trigger
  constants swamp the data term), so the second decade is the honest
  growth signal: alpha ~ 1.0 is data-parallel linear, alpha ~ 2.0 is
  quadratic, alpha < 1 means fixed costs still amortizing;
- shuffle_alpha = log10(mb(100x)/mb(10x)) where both sides shuffle: the
  volume signal, immune to host-interference bursts.

A pipeline is FLAGGED when r_decade2 > flag_ratio (default 12 = 1.2x
linear at 10x rows per decade). Flags carry attributions via --attr
(quadratic-by-construction shapes); an OPEN flag must be fixed.

Dev tooling only (like tools/oracle_check.py / scaling_check.py) — the
library never imports this.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    cells = {p["pipeline"]: p for p in d["pipelines"]}
    return d, cells


def main():
    argv = list(sys.argv[1:])
    attr = {}
    if "--attr" in argv:
        i = argv.index("--attr")
        with open(argv[i + 1]) as f:
            attr = json.load(f)
        del argv[i:i + 2]
    if len(argv) < 4:
        sys.exit(__doc__)
    p1, p10, p100, out = argv[0], argv[1], argv[2], argv[3]
    flag_ratio = float(argv[4]) if len(argv) > 4 else 12.0
    d1, c1 = load(p1)
    d10, c10 = load(p10)
    d100, c100 = load(p100)
    common = [k for k in c1 if k in c10 and k in c100]
    fits, failed = {}, []
    for k in common:
        a, b, c = c1[k], c10[k], c100[k]
        if not (a["pass"] and b["pass"] and c["pass"]):
            failed.append(k)
            continue
        r1 = b["sec"] / a["sec"] if a["sec"] > 0 else None
        r2 = c["sec"] / b["sec"] if b["sec"] > 0 else None
        fit = {
            "sec": [a["sec"], b["sec"], c["sec"]],
            "shuffle_mb": [a["shuffle_mb"], b["shuffle_mb"],
                           c["shuffle_mb"]],
            "rows_out": [a["rows"], b["rows"], c["rows"]],
            "r_decade1": round(r1, 2) if r1 is not None else None,
            "r_decade2": round(r2, 2) if r2 is not None else None,
            "alpha": (round(math.log10(r2), 2)
                      if r2 is not None and r2 > 0 else None),
        }
        if b["shuffle_mb"] > 0.05 and c["shuffle_mb"] > 0.05:
            fit["shuffle_alpha"] = round(
                math.log10(c["shuffle_mb"] / b["shuffle_mb"]), 2)
        fits[k] = fit
    flagged = sorted(
        [k for k, f in fits.items()
         if f["r_decade2"] is not None and f["r_decade2"] > flag_ratio],
        key=lambda k: -fits[k]["r_decade2"])
    tot = [round(sum(c[k]["sec"] for k in fits), 1)
           for c in (c1, c10, c100)]
    report = {
        "legs": [{"path": p, "sf_dir": d["sf_dir"], "total_sec": t}
                 for p, d, t in zip((p1, p10, p100), (d1, d10, d100), tot)],
        "rows_ratio_per_decade": 10,
        "flag_ratio": flag_ratio,
        "n_common": len(common),
        "n_failed": len(failed),
        "failed": failed,
        "aggregate_r_decade1": round(tot[1] / tot[0], 2) if tot[0] else None,
        "aggregate_r_decade2": round(tot[2] / tot[1], 2) if tot[1] else None,
        "n_flagged": len(flagged),
        "n_flagged_attributed": len([k for k in flagged if k in attr]),
        "n_flagged_open": len([k for k in flagged if k not in attr]),
        "flagged": {k: dict(fits[k], **({"attribution": attr[k]}
                                        if k in attr else {}))
                    for k in flagged},
        "pipelines": fits,
    }
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"{len(common)} pipelines, {len(failed)} failed; aggregate "
          f"decade ratios {report['aggregate_r_decade1']}x / "
          f"{report['aggregate_r_decade2']}x; {len(flagged)} flagged "
          f"> {flag_ratio}x in the top decade")
    for k in sorted(fits, key=lambda k: -(fits[k]["alpha"]
                                          if fits[k]["alpha"] is not None
                                          else -9)):
        f = fits[k]
        tag = ("FLAG-" + ("ATTRIBUTED" if k in attr else "OPEN") + " "
               if k in flagged else "")
        sh = (f" shuffle_alpha={f['shuffle_alpha']}"
              if "shuffle_alpha" in f else "")
        print(f"  {tag}{k}: {f['sec'][0]}s -> {f['sec'][1]}s -> "
              f"{f['sec'][2]}s  alpha={f['alpha']}{sh}")
    sys.exit(0)


if __name__ == "__main__":
    main()
