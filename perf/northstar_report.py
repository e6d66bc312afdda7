#!/usr/bin/env python
"""Summarize the 25k north-star flagship run (VERDICT r3 #1) into
perf/NORTHSTAR_r04.md: training curve milestones from the run's
metrics.json (JSON-lines), final eval metric files, artifact inventory
(checkpoints / videos / buffer maps), and wall-clock accounting.

Usage: python perf/northstar_report.py [run_dir]
       (default work_dirs/northstar/r4_25k)
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "work_dirs/northstar/r4_25k"
    lines = [f"# North-star flagship run: `{run}`", ""]

    # training curve from JSON-lines metrics.json
    mpath = os.path.join(run, "metrics.json")
    curve = []
    if os.path.exists(mpath):
        with open(mpath) as f:
            for ln in f:
                try:
                    curve.append(json.loads(ln))
                except json.JSONDecodeError:
                    pass
    if curve:
        steps = [c for c in curve if "psnr" in c and "iteration" in c]
        lines += ["## Training curve (smoothed meters at print_freq)", "",
                  "| step | psnr | range_rmse | rgb_loss |", "|---|---|---|---|"]
        marks = {200, 1000, 2500, 5000, 10000, 15000, 20000, 22400, 22600,
                 24800, 25000}
        last = steps[-1]["iteration"] if steps else None
        for c in steps:
            s = c["iteration"]
            if s in marks or s == last:
                lines.append(
                    f"| {s} | {c.get('psnr', float('nan')):.2f} | "
                    f"{c.get('range_rmse', float('nan')):.3f} | "
                    f"{c.get('rgb_loss', float('nan')):.4f} |")
        lines.append("")

    # final eval metric jsons
    for pat, title in (("metrics_all_*.json", "Final evaluation"),
                       ("metrics_lowres_*.json", "Low-res eval"),
                       ("metrics_full_*.json", "Full-res eval")):
        for p in sorted(glob.glob(os.path.join(run, pat))):
            with open(p) as f:
                d = json.load(f)
            lines += [f"## {title} (`{os.path.basename(p)}`)", ""]
            for k, v in d.items():
                lines.append(f"- {k}: {v:.4f}" if isinstance(v, float)
                             else f"- {k}: {v}")
            lines.append("")

    # artifact inventory
    lines += ["## Artifacts", ""]
    for sub in ("checkpoint_*", "lowres_videos/*", "full_videos/*",
                "videos/*", "buffer_maps/*", "images/*", "test_videos/*"):
        hits = sorted(glob.glob(os.path.join(run, sub)))
        if hits:
            lines.append(f"- {sub}: {len(hits)} "
                         f"({', '.join(os.path.basename(h) for h in hits[:4])}"
                         f"{', ...' if len(hits) > 4 else ''})")
    lines.append("")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "NORTHSTAR_r04.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
