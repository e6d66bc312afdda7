#!/usr/bin/env python
"""Summarize perf/QUALITY_r02.json: per-variant dB deltas vs base at the
largest COMMON step (variants killed by the queue timeout still compare
fairly), plus speed. Used to decide which TPU-first divergences stay
default-on (VERDICT round-1 #2).

Base selection: variants recorded on the pre-pruning defaults (round 2,
before commit bb10e44) compare vs "base"; variants recorded on the
pruning-on defaults (round 3+, listed in R3_VARIANTS) compare vs
"stopk32l16", which IS the current-default curve.
"""

import json
import os
import sys

# recorded on pruning-on defaults -> base is the stopk32l16 curve
R3_VARIANTS = {"hash", "refsem", "refsembrick", "stagedl16", "nofuse",
               "timepair0", "onehot0", "lprop6432", "prop6432",
               "mx", "mxr8", "mxr32", "brick4k", "hash4k", "refsembrick4k"}

# matched pairs measured against each other, not the default curve
BASE_OVERRIDE = {"hash4k": "brick4k", "refsembrick4k": "brick4k",
                 "refsem4k2500": "brick4k2500"}

# anchors of matched pairs: not variants themselves — comparing a 1/4-batch
# run against the full-batch default curve would be a cross-batch apples
# comparison, so these only appear as the `base` of their pair rows
PAIR_BASES = {"brick4k", "brick4k2500"}


def _ms(v):
    """Steady-state step time if recorded; legacy ms_per_step otherwise.
    None (not a substituted base value) when timing is missing — ADVICE r2."""
    return v.get("steady_ms_per_step") or v.get("ms_per_step") \
        or v.get("wall_ms_per_step_incl_compile")


def main():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "QUALITY_r02.json")
    d = json.load(open(path))
    if "base" not in d:
        sys.exit("no base variant yet")
    print(f"{'variant':<14}{'base':<11}{'@step':>6}{'psnr':>8}{'d_psnr':>8}"
          f"{'rmse':>7}{'ms/step':>9}{'speed x':>8}")
    rows = {}
    for name, v in d.items():
        if not v["curve"] or name in PAIR_BASES:
            continue
        # anchor priority: explicit pair override > the recorded-era flag
        # (rows measured after the staged lidar-K default carry
        # defaults_era="staged" and replay the stagedl16 curve as their
        # matched base) > the legacy name sets
        if name in BASE_OVERRIDE:
            base_name = BASE_OVERRIDE[name]
        elif v.get("defaults_era") == "staged" and name != "stagedl16":
            base_name = "stagedl16"
        else:
            base_name = "stopk32l16" if name in R3_VARIANTS else "base"
        if base_name not in d:
            continue
        base = d[base_name]
        base_curve = {c["step"]: c for c in base["curve"]}
        base_ms = _ms(base)
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
        ms = _ms(v)
        speed = round(base_ms / ms, 3) if (ms and base_ms) else None
        print(f"{name:<14}{base_name:<11}{common:>6}{vc['psnr']:>8.2f}"
              f"{vc['psnr'] - b['psnr']:>+8.2f}{vc['range_rmse']:>7.2f}"
              f"{ms or float('nan'):>9.1f}"
              f"{speed if speed is not None else float('nan'):>8.2f}")
        rows[name] = {
            "base": base_name,
            "common_step": common,
            "psnr": vc["psnr"],
            "d_psnr_vs_base": round(vc["psnr"] - b["psnr"], 3),
            "range_rmse": vc["range_rmse"],
            "base_range_rmse": b["range_rmse"],
            "steady_ms_per_step": ms,
            "speedup_vs_base": speed,
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
