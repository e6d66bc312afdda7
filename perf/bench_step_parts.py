#!/usr/bin/env python
"""Decompose the full train-step cost by toggling model branches.

Runs the fused step at the reference workload with parts disabled to
attribute wall time: full, no-flow (no temporal aggregation: 1 dynamic
query instead of 3 + no flow queries), static-only, pixel-only.

Usage: python perf/bench_step_parts.py [--steps 2] [--only NAME]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

sys.path.insert(0, ".")


def run_case(name, overrides, steps, lidar=True):
    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship
    from emernerf_tpu.train.step import build_train_step, init_train_state

    cfg, dataset, model, prop_models, step_cfg = build_flagship(
        tiny=False, overrides=overrides
    )
    if not lidar:
        import dataclasses

        step_cfg = dataclasses.replace(step_cfg, has_lidar=False)
    scene = dataset.scene_tensors()
    key = jax.random.PRNGKey(0)
    rb = cfg.data.ray_batch_size
    pixel_batch = sample_pixel_batch(scene, key, rb, use_timestamps=True)
    lidar_batch = sample_lidar_batch(scene, key, rb) if lidar else None
    state = init_train_state(model, prop_models, step_cfg, key, pixel_batch)
    step_fn = build_train_step(model, prop_models, step_cfg)

    t0 = time.time()
    state, m = step_fn(state, pixel_batch, lidar_batch, key,
                       pixel_rg=False, lidar_rg=False)
    float(m["psnr"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        state, m = step_fn(state, pixel_batch, lidar_batch, key,
                           pixel_rg=False, lidar_rg=False)
    float(m["psnr"])
    sec = (time.time() - t0) / steps
    print(f"{name:28s} {sec * 1e3:9.1f} ms/step  (compile {compile_s:.0f}s)",
          flush=True)


CASES = {
    "full": ([], True),
    "no_flow": (["nerf.model.head.enable_flow_branch=false"], True),
    "static_only": ([
        "nerf.model.head.enable_flow_branch=false",
        "nerf.model.head.enable_dynamic_branch=false",
        "nerf.model.head.enable_shadow_head=false",
    ], True),
    "full_pixel_only": ([], False),
    "prop_rg": ([], True),  # placeholder; rg handled below
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--only", default=None)
    args = p.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for name, (ov, lidar) in CASES.items():
        if name == "prop_rg":
            continue
        if args.only and args.only != name:
            continue
        try:
            run_case(name, ov, args.steps, lidar)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
