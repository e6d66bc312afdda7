#!/usr/bin/env python
"""Summarize perf/QUALITY_r02.json: per-variant dB deltas vs base at the
largest COMMON step (variants killed by the queue timeout still compare
fairly), plus speed. Used to decide which TPU-first divergences stay
default-on (VERDICT round-1 #2)."""

import json
import os
import sys


def main():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "QUALITY_r02.json")
    d = json.load(open(path))
    if "base" not in d:
        sys.exit("no base variant yet")
    base_curve = {c["step"]: c for c in d["base"]["curve"]}
    print(f"{'variant':<14}{'@step':>6}{'psnr':>8}{'d_psnr':>8}"
          f"{'rmse':>7}{'ms/step':>9}{'speed x':>8}")
    base_ms = d["base"]["ms_per_step"]
    for name, v in d.items():
        if not v["curve"]:
            continue
        common = max(
            (s for s in base_curve if s <= v["curve"][-1]["step"]),
            default=None,
        )
        if common is None:
            continue
        vc = {c["step"]: c for c in v["curve"]}.get(common)
        if vc is None:
            continue
        b = base_curve[common]
        ms = v["ms_per_step"] or base_ms
        print(f"{name:<14}{common:>6}{vc['psnr']:>8.2f}"
              f"{vc['psnr'] - b['psnr']:>+8.2f}{vc['range_rmse']:>7.2f}"
              f"{ms:>9.1f}{base_ms / ms:>8.2f}")


if __name__ == "__main__":
    main()
