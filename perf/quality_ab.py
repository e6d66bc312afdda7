#!/usr/bin/env python
"""Flagship-scale quality A/B on the real TPU chip (VERDICT round-1 #2).

Trains the full dynamic+flow flagship configuration on the synthetic
driving scene for --steps optimizer iterations per variant and records the
smoothed training PSNR / range RMSE trajectory, so every TPU-first
divergence that is ON by default has a measured dB cost at a scale where
hash collisions and the lr schedule actually bite (the round-1 gate was 60
steps of a tiny model).

Variants (vs the default brick + fused + topk16 + no-subsample):
  base        defaults
  topk0       temporal_agg_topk=0 (reference semantics: warp every sample)
  sub4/sub8   grad_subsample=4/8 (stochastic fine-level table grads)
  nofuse      separate dynamic/flow grids (reference table layout)
  timepair0   unpaired 4D rows
Writes perf/QUALITY_r02.json (merged across invocations, so variants can
run in separate processes / sessions).

Usage: python perf/quality_ab.py --variant base --steps 2000
       python perf/quality_ab.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

VARIANTS = {
    "base": [],
    "topk0": ["nerf.model.head.temporal_agg_topk=0"],
    "sub4": ["nerf.model.perf.grad_subsample=4"],
    "sub8": ["nerf.model.perf.grad_subsample=8"],
    "nofuse": ["nerf.model.fuse_flow_grid=false"],
    # reference-exact formulation: tcnn-layout hash grids instead of the
    # TPU brick grids (the 4th default-on divergence; VERDICT r1 #2)
    "hash": ["nerf.model.grid_backend=hash"],
    "timepair0": [],  # handled via spec rebuild below
    "onehot0": ["nerf.model.perf.onehot_budget=0"],
    # top-K sample pruning (render/renderer.py:_topk_sample_select):
    # K of the 64 final samples, gumbel temp 0.3 for exploration
    "stopk32": ["nerf.sampling.sample_topk=32",
                "nerf.sampling.sample_topk_temp=0.3"],
    "stopk24": ["nerf.sampling.sample_topk=24",
                "nerf.sampling.sample_topk_temp=0.3"],
    # combined candidate default: pruning + stochastic fine-level grads
    "stopk32sub4": ["nerf.sampling.sample_topk=32",
                    "nerf.sampling.sample_topk_temp=0.3",
                    "nerf.model.perf.grad_subsample=4"],
    # pruning with a more aggressive K on the density-only lidar branch
    # (depth/LoS supervision concentrates near the return)
    "stopk32l16": ["nerf.sampling.sample_topk=32",
                   "nerf.sampling.sample_topk_temp=0.3",
                   "nerf.sampling.lidar_sample_topk=16"],
    # halved proposal sample counts (the prop-grid forward is ~25M F=1
    # gather rows/step at the reference's [128, 64]; the sampler's
    # compare-all fusions scale the same way)
    "prop6432": ["nerf.propnet.num_samples_per_prop=[64,32]"],
    # halved proposal counts on the lidar branch only (the density-only
    # branch needs the hierarchy only to localize the lidar return)
    "lprop6432": ["nerf.propnet.lidar_num_samples_per_prop=[64,32]"],
    # JOINT reference-semantics stack (VERDICT r2 #3): every default-on
    # TPU divergence off at once — tcnn-layout hash grids (which also
    # disables fuse_flow_grid and time_pair: both are brick-row layouts,
    # builders.py:163), warp every sample, shade every sample on both
    # branches.  Reference: radiance_field.py:553-620, render_utils.py:326-347.
    "refsem": ["nerf.model.grid_backend=hash",
               "nerf.model.head.temporal_agg_topk=0",
               "nerf.sampling.sample_topk=0",
               "nerf.sampling.lidar_sample_topk=0"],
    # staged lidar-K (VERDICT r2 #5): prune the density-only lidar branch
    # to 16 samples for the first 90% of steps, full 64 for the last 10%
    # (a second compiled variant, like the rg switch) to recover the
    # end-of-schedule depth accuracy that constant K=16 loses.
    "stagedl16": ["nerf.sampling.sample_topk=32",
                  "nerf.sampling.sample_topk_temp=0.3",
                  "nerf.sampling.lidar_sample_topk=16",
                  "nerf.sampling.lidar_topk_until=0.9"],
    # JOINT reference-semantics stack MINUS the grid backend: every
    # pruning/fusion divergence off at once, brick grids kept (the full
    # `refsem` with tcnn-layout hash grids measures ~25x slower steps —
    # economically unrunnable for 2500 flagship steps on one chip; the
    # backend itself is gated separately by the matched brick4k/hash4k
    # pair below).  +timepair0 applied via spec rebuild.
    "refsembrick": ["nerf.model.head.temporal_agg_topk=0",
                    "nerf.sampling.sample_topk=0",
                    "nerf.sampling.lidar_sample_topk=0",
                    "nerf.model.fuse_flow_grid=false"],
    # scatter-free MXU-native encoder (ops/mxgrid.py): dense coarse brick
    # levels + CP-factorized fine lines, fwd AND bwd as matmuls.  Rank is
    # the capacity knob; the A/B decides if low-rank fine levels match
    # hashed-collision fine levels at flagship scale.
    "mx": ["nerf.model.grid_backend=mx"],
    "mxr32": ["nerf.model.grid_backend=mx", "nerf.model.perf.mx_rank=32"],
    # matched brick-vs-hash pair at 1/4 ray batch: full-size flagship
    # model (real table sizes -> real hash-collision rates), 4096+4096
    # rays, same steps — the scale where the reference-exact hash layout
    # is affordable on one chip.  THE brick-grid quality gate (VERDICT
    # r2 #2) when the full-batch `hash` run can only reach a few hundred
    # steps inside its timeout.
    "brick4k": ["data.ray_batch_size=4096"],
    "hash4k": ["data.ray_batch_size=4096",
               "nerf.model.grid_backend=hash"],
    # the joint pruning/fusion reference-semantics stack at 1/4 ray batch,
    # matched against the recorded `brick4k` pair: completes the joint-stack
    # measurement (VERDICT r2 #3) at a scale where 1000+ steps fit in the
    # chip budget.  Combined with the matched hash4k/brick4k backend pair,
    # every default-on divergence is covered by a matched-iteration A/B:
    # joint(prune+fuse+timepair) here, backend there.  +timepair0 applied
    # via spec rebuild (_TIMEPAIR0).
    "refsembrick4k": ["data.ray_batch_size=4096",
                      "nerf.model.head.temporal_agg_topk=0",
                      "nerf.sampling.sample_topk=0",
                      "nerf.sampling.lidar_sample_topk=0",
                      "nerf.model.fuse_flow_grid=false"],
    # 2500-step editions of the 1/4-batch joint pair under their own names
    # so the recorded 1000-step brick4k/hash4k/refsembrick4k rows (and the
    # hash4k pair match) survive — results merge by name, and a rerun at a
    # different num_iters changes the whole lr schedule
    "brick4k2500": ["data.ray_batch_size=4096"],
    "refsem4k2500": ["data.ray_batch_size=4096",
                     "nerf.model.head.temporal_agg_topk=0",
                     "nerf.sampling.sample_topk=0",
                     "nerf.sampling.lidar_sample_topk=0",
                     "nerf.model.fuse_flow_grid=false"],
    # footprint-based fine-level skipping on the proposal grids (round 4,
    # models/fields.py DensityField): finest K levels queried only for the
    # near half of each ray's samples
    "finelvl2": ["nerf.propnet.fine_level_skip=2"],
    "finelvl3": ["nerf.propnet.fine_level_skip=3",
                 "nerf.propnet.fine_level_frac=0.375"],
    # the round-4 combined row-knob candidate default: halved lidar-branch
    # prop samples + halved pixel-branch prop samples + K=24 radiance
    # pruning + fine-level skipping on the prop grids.  One run gives the
    # joint quality gate AND the joint speed (steady_ms_per_step)
    "rowstack": ["nerf.propnet.lidar_num_samples_per_prop=[64,32]",
                 "nerf.propnet.num_samples_per_prop=[64,32]",
                 "nerf.sampling.sample_topk=24",
                 "nerf.propnet.fine_level_skip=2"],
    # PIXEL-side row knobs only (round 5): the joint rowstack run passed
    # its PSNR gate but FAILED depth (range RMSE 6.2 vs anchor 0.32 at
    # 2400 — the lidar-branch prop hierarchy and the fine-skipped prop
    # grids both feed the LoS loss).  This stack leaves the lidar branch
    # untouched: halved PIXEL prop rows + K=24 radiance pruning.
    "pixstack": ["nerf.propnet.num_samples_per_prop=[64,32]",
                 "nerf.propnet.lidar_num_samples_per_prop=[128,64]",
                 "nerf.sampling.sample_topk=24"],
}

# variants whose spec rebuild turns off the 4D time-paired rows
_TIMEPAIR0 = {"timepair0", "refsembrick", "refsembrick4k", "refsem4k2500"}

# Variants recorded at or after round 3 run on the pruning-on defaults
# (sample_topk=32, lidar_sample_topk=16 — commit bb10e44); their base
# curve is the "stopk32l16" entry, NOT "base" (old pre-pruning defaults).
R3_BASE = "stopk32l16"

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "QUALITY_r02.json")


def run_variant(name: str, steps: int, eval_window: int = 50,
                record_every: int = 100):
    import jax

    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship
    from emernerf_tpu.train.step import build_train_step, init_train_state, lidar_full_at
    from emernerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    overrides = VARIANTS[name]
    # compressed-but-complete schedule: warmup (10%) and all four lr
    # milestones (1/4, 1/2, 3/4, 9/10 of num_iters) land inside the run
    cfg, dataset, model, prop_models, step_cfg = build_flagship(
        overrides=[f"optim.num_iters={steps}", *overrides]
    )
    if name in _TIMEPAIR0:
        import dataclasses

        kw = {}
        for attr in ("dynamic_spec", "flow_spec"):
            spec = getattr(model, attr, None)
            if spec is not None and getattr(spec, "time_pair", False):
                kw[attr] = dataclasses.replace(spec, time_pair=False)
        if kw:
            model = model.clone(**kw)
    scene = dataset.scene_tensors()
    key = jax.random.PRNGKey(0)
    ray_batch = cfg.data.ray_batch_size

    @jax.jit
    def make_batches(scene, key):
        k1, k2 = jax.random.split(key)
        return (
            sample_pixel_batch(scene, k1, ray_batch, use_timestamps=True),
            sample_lidar_batch(scene, k2, ray_batch),
        )

    pixel_batch, lidar_batch = make_batches(scene, key)
    state = init_train_state(model, prop_models, step_cfg, key, pixel_batch)
    step_fn = build_train_step(model, prop_models, step_cfg)

    # record which committed-default era this row was measured on:
    # rows recorded after the staged lidar-K default (round 3+) anchor to
    # the `stagedl16` curve, not `stopk32l16`/`base` (quality_report.py)
    extra = {
        "defaults_lidar_topk_until": float(
            getattr(step_cfg, "lidar_topk_until", 1.0)),
        "defaults_era": "staged" if lidar_full_at(
            step_cfg, steps - 1) else "prestaged",
    }

    t0 = time.time()
    psnrs, rmses, curve = [], [], []
    for it in range(steps):
        key, k_b, k_s = jax.random.split(key, 3)
        pixel_batch, lidar_batch = make_batches(scene, k_b)
        rg = it < 512 or it % 5 == 0
        # the axon remote-compile tunnel occasionally drops mid-response
        # (observed killing a 2500-step run at it=512, where the first
        # rg=False variant compiles); retry the step — recompiles hit the
        # persistent cache, so a retry is cheap
        for attempt in range(4):
            try:
                state, m = step_fn(state, pixel_batch, lidar_batch, k_s,
                                   pixel_rg=rg, lidar_rg=rg,
                                   lidar_full=lidar_full_at(step_cfg, it))
                break
            except jax.errors.JaxRuntimeError as e:
                if attempt == 3:
                    raise
                print(f"[{name}] step {it} failed ({e}); retry "
                      f"{attempt + 1}/3", flush=True)
                time.sleep(20.0 * (attempt + 1))
        psnrs.append(m["psnr"])
        rmses.append(m["range_rmse"])
        if (it + 1) % record_every == 0:
            # fetch a window median (one device->host sync per record)
            w = [float(p) for p in psnrs[-eval_window:]]
            r = [float(p) for p in rmses[-eval_window:]]
            curve.append(
                {
                    "step": it + 1,
                    "psnr": round(float(np.median(w)), 3),
                    "range_rmse": round(float(np.median(r)), 3),
                    "t": round(time.time() - t0, 1),
                }
            )
            print(f"[{name}] {it + 1}/{steps}  psnr {curve[-1]['psnr']:.2f} "
                  f"rmse {curve[-1]['range_rmse']:.2f}", flush=True)
            psnrs, rmses = [], []
            # incremental write: a `timeout` kill mid-run (the queue wraps
            # each variant in one) must not lose the curve-so-far
            _write_result(name, steps, time.time() - t0, curve,
                          partial=True, extra=extra)
    wall = time.time() - t0
    result = _write_result(name, steps, wall, curve, partial=False,
                           extra=extra)
    print(json.dumps({name: {k: v for k, v in result.items() if k != "curve"}}))


def _write_result(name, steps, wall, curve, partial, extra=None):
    # steady-state step time: slope of the curve timestamps AFTER the first
    # record window, so compile + rg-warmup wall time is excluded (VERDICT
    # r2 weak #6: the old ms_per_step conflated them and got misquoted).
    steady = None
    timed = [c for c in curve if "t" in c]
    if len(timed) >= 2:
        dt = timed[-1]["t"] - timed[0]["t"]
        dstep = timed[-1]["step"] - timed[0]["step"]
        if dstep > 0:
            steady = round(dt / dstep * 1e3, 1)
    result = {
        "steps": steps,
        "steps_done": curve[-1]["step"] if curve else 0,
        "partial": partial,
        "wall_s": round(wall, 1),
        "wall_ms_per_step_incl_compile": round(
            wall / max(curve[-1]["step"], 1) * 1e3, 1) if curve else None,
        "steady_ms_per_step": steady,
        "final_psnr": curve[-1]["psnr"] if curve else None,
        "final_range_rmse": curve[-1]["range_rmse"] if curve else None,
        "curve": curve,
    }
    if extra:
        result.update(extra)
    merged = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            merged = json.load(f)
    merged[name] = result
    tmp = OUT_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=1)
    os.replace(tmp, OUT_PATH)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base")
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list:
        print(" ".join(VARIANTS))
        return
    run_variant(args.variant, args.steps)


if __name__ == "__main__":
    main()
    os._exit(0)
