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
    rows = {}
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
        rows[name] = {
            "common_step": common,
            "psnr": vc["psnr"],
            "d_psnr_vs_base": round(vc["psnr"] - b["psnr"], 3),
            "range_rmse": vc["range_rmse"],
            "base_range_rmse": b["range_rmse"],
            "ms_per_step": ms,
            "speedup_vs_base": round(base_ms / ms, 3),
            # north-star gate (BASELINE.md 0.2 dB; VERDICT r1 #2 asks
            # <= 0.3): |d| covers both directions — a reference-semantics
            # comparator (hash/nofuse/timepair0/topk0) must not beat base
            # by > 0.3 dB, and a candidate default (stopk*) must not cost
            # > 0.3 dB vs base.
            "within_0p3_db": bool(abs(vc["psnr"] - b["psnr"]) <= 0.3),
        }
    if "--json" in sys.argv:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "QUALITY_VERDICTS.json")
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
