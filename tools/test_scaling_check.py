#!/usr/bin/env python3
"""Synthetic-input test for scaling_check.py's ratio-regression gate —
in particular the RR_HARD secondary trigger the r16 round was blind to
(a 1.16→5.81×/decade bend, rr 5.01, ducked under the half-threshold
gate because its absolute ratio 5.81 < 6).

Run: python3 tools/test_scaling_check.py   (exits 0 on pass)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "scaling_check.py")


def run_case(tmp, prev_ratios, cur_ratios):
    """Build synthetic bench pairs: prev round's sweep with the given
    per-query ratios, current round's sweep with the given ratios, then
    run scaling_check --prev and return the report's regressions."""
    small_prev = {k: 1.0 for k in prev_ratios}
    large_prev = {k: r for k, r in prev_ratios.items()}
    small_cur = {k: 1.0 for k in cur_ratios}
    large_cur = {k: r for k, r in cur_ratios.items()}

    def bench(qs, sf, name):
        p = os.path.join(tmp, name)
        with open(p, "w") as f:
            json.dump({"metric": "t", "value": sum(qs.values()),
                       "unit": "sec", "sf": sf, "queries": qs}, f)
        return p

    sp = bench(small_prev, 0.1, "sp.json")
    lp = bench(large_prev, 1.0, "lp.json")
    prev_out = os.path.join(tmp, "prev_scaling.json")
    subprocess.run([sys.executable, CHECK, sp, lp, "10", prev_out],
                   check=True, capture_output=True)

    sc = bench(small_cur, 0.1, "sc.json")
    lc = bench(large_cur, 1.0, "lc.json")
    cur_out = os.path.join(tmp, "cur_scaling.json")
    subprocess.run([sys.executable, CHECK, sc, lc, "10", cur_out,
                    "--prev", prev_out],
                   check=True, capture_output=True)
    with open(cur_out) as f:
        return json.load(f)["vs_prev_round"]["ratio_regressions"]


def main():
    with tempfile.TemporaryDirectory() as tmp:
        # The r16 blind spot, reproduced: a cell bends 1.16 -> 5.81
        # (rr 5.01). Absolute ratio 5.81 < 6 = half the 12x flag line,
        # so the primary gate stays silent — RR_HARD must fire.
        reg = run_case(tmp,
                       prev_ratios={"q_hist": 1.16, "q_ok": 2.0},
                       cur_ratios={"q_hist": 5.81, "q_ok": 2.1})
        assert "q_hist" in reg, f"RR_HARD trigger missed the 5x bend: {reg}"
        assert reg["q_hist"]["ratio_of_ratios"] == 5.01, reg["q_hist"]
        assert "q_ok" not in reg, f"stable cell falsely flagged: {reg}"

        # Primary gate still fires: ratio grows 1.6x into super-linear
        # territory (8 -> 12.8, above half the flag line) with rr < 3.
        reg = run_case(tmp,
                       prev_ratios={"q_grow": 8.0},
                       cur_ratios={"q_grow": 12.8})
        assert "q_grow" in reg, f"primary trigger lost: {reg}"

        # Noise floor still ignored: overhead-dominated jitter (0.2 ->
        # 0.4, rr 2.0 < 3, absolute ratio far under the floor) stays
        # unflagged.
        reg = run_case(tmp,
                       prev_ratios={"q_tiny": 0.2},
                       cur_ratios={"q_tiny": 0.4})
        assert reg == {}, f"noise falsely flagged: {reg}"
    print("test_scaling_check: 3 cases passed")


if __name__ == "__main__":
    main()
