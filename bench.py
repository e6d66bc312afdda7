#!/usr/bin/env python
"""Training-throughput benchmark on the flagship EmerNeRF configuration.

Measures steady-state fused-train-step throughput (8192 pixel + 8192 lidar
rays per iteration, 128+64 proposal + 64 final samples per ray, full
dynamic + flow model — the reference's default workload,
configs/default_config.yaml:7,45,60) and prints ONE JSON line:

  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N / 2e6}

Baseline: the BASELINE.json north-star of 2M rays/s (v5e-8); on a single
chip the per-chip fraction of that target is the honest comparison, so
vs_baseline uses the full 2M divided by the chips actually used.
"""

import json
import os
import sys
import time

import jax

# honor JAX_PLATFORMS even when a site-level PJRT plugin registers a
# different default backend (same pattern as train_emernerf.py: enables
# BENCH_PRESET=tiny CPU smoke runs on a TPU-attached host)
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    jax.config.update("jax_platforms", _plat)

from emernerf_tpu.utils.cache import enable_compilation_cache


def _require_devices(timeout_s: float = 300.0):
    """Fail fast (instead of hanging the caller) when the remote TPU
    tunnel is dead: jax.devices() on the axon backend blocks forever if
    the relay is down, so probe it from a watchdog thread.  Normal tunnel
    init takes ~35 s; 300 s is generous."""
    import threading

    out = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # pragma: no cover - backend-specific
            out["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in out:
        return out["devices"]
    err = out.get("error", f"jax.devices() unresponsive after {timeout_s:.0f}s")
    print(json.dumps({
        "metric": "train_rays_per_sec", "value": 0.0, "unit": "rays/s",
        "vs_baseline": 0.0, "error": f"device backend unavailable: {err}",
    }))
    sys.stdout.flush()
    os._exit(1)


def _refuse_if_chip_busy():
    """A bench overlapping another chip job measures contention, not the
    program (round-4 weak #3: the driver bench ran while the flagship
    held the chip and reported -5% on an unchanged default).  Every
    long-running chip job in this repo records its pid in /tmp (the
    tpu_queue*.sh / flagship launch convention); refuse to bench while
    any of them is alive.  BENCH_IGNORE_LOCK=1 overrides (for intentional
    contention experiments)."""
    import glob as _glob

    if os.environ.get("BENCH_IGNORE_LOCK") == "1":
        return
    patterns = ("/tmp/northstar*.pid", "/tmp/flagship*.pid",
                "/tmp/rowstack*.pid", "/tmp/tpu_queue*.pid",
                "/tmp/quality*.pid", "/tmp/chipjob*.pid")
    for pat in patterns:
        for p in _glob.glob(pat):
            try:
                pid = int(open(p).read().strip())
                os.kill(pid, 0)  # raises if not alive
                # guard against pid recycling: only treat it as a chip
                # job if the live process looks like one of ours
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ").decode(
                        "utf-8", "replace")
                if not any(s in cmd for s in
                           ("python", "train_emernerf", "quality_ab",
                            "tpu_queue", "bash")):
                    continue
            except (ValueError, OSError):
                continue
            print(json.dumps({
                "metric": "train_rays_per_sec", "value": 0.0,
                "unit": "rays/s", "vs_baseline": 0.0,
                "error": f"chip busy: live job pid {pid} ({p}); "
                         "re-run when it finishes or set "
                         "BENCH_IGNORE_LOCK=1",
            }))
            sys.stdout.flush()
            os._exit(2)


def main():
    enable_compilation_cache()
    _refuse_if_chip_busy()
    _require_devices()
    preset = os.environ.get("BENCH_PRESET", "full")
    tiny = preset == "tiny"
    steps = int(os.environ.get("BENCH_STEPS", "4" if not tiny else "3"))

    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship
    from emernerf_tpu.train.step import build_train_step, init_train_state

    # BENCH_OVERRIDES="a.b=1,c.d=2" benches a config variant without
    # editing configs/ (the committed default is what the driver measures).
    # A ";" separator is also accepted — required when an override VALUE
    # contains commas (e.g. num_samples_per_prop=[64,32])
    raw = os.environ.get("BENCH_OVERRIDES", "")

    def _split_overrides(raw: str) -> list:
        # When ";" is present it is THE separator (the documented escape
        # for comma-containing values like a.b=x,y); otherwise split on
        # "," — in both cases only at bracket depth 0, so a list-valued
        # override (num_samples_per_prop=[64,32]) needs no quoting games
        seps = ";" if ";" in raw else ","
        out, cur, depth = [], [], 0
        for ch in raw:
            if ch in "[(":
                depth += 1
            elif ch in "])":
                depth -= 1
                if depth < 0:
                    # an unbalanced "]"/")" would silently fuse the rest
                    # of the overrides into one malformed entry; fail loud
                    raise ValueError(
                        f"unbalanced bracket in BENCH_OVERRIDES: {raw!r}")
            if ch in seps and depth == 0:
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if depth != 0:
            raise ValueError(
                f"unclosed bracket in BENCH_OVERRIDES: {raw!r}")
        out.append("".join(cur))
        return [s.strip() for s in out if s.strip()]

    overrides = _split_overrides(raw)
    # BENCH_PROFILE=reference measures the REFERENCE work definition —
    # shade every sample on both branches, warp every sample (no top-K
    # pruning anywhere), like configs/default_config.yaml:45,60 in the
    # reference — and records the result into perf/BENCH_PROFILES.json;
    # the default (pruned-profile) run embeds that recording so the
    # BENCH JSON always states both work definitions (VERDICT r2 #4).
    profile = os.environ.get("BENCH_PROFILE", "default")
    if profile == "reference":
        overrides = [
            "nerf.sampling.sample_topk=0",
            "nerf.sampling.lidar_sample_topk=0",
            "nerf.model.head.temporal_agg_topk=0",
            *overrides,
        ]
    cfg, dataset, model, prop_models, step_cfg = build_flagship(
        tiny=tiny, overrides=overrides
    )
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

    # compile + warmup.  NOTE: on the axon remote backend block_until_ready
    # returns before remote execution finishes; a scalar device->host fetch
    # is the only true synchronization, so every timing below fetches.
    t_c0 = time.time()
    state, m = step_fn(state, pixel_batch, lidar_batch, key,
                       pixel_rg=False, lidar_rg=False)
    float(m["psnr"])
    compile_s = time.time() - t_c0

    # no-prop-grad variant (4 of 5 steps in real training)
    t0 = time.time()
    for i in range(steps):
        key, k_b, k_s = jax.random.split(key, 3)
        pixel_batch, lidar_batch = make_batches(scene, k_b)
        state, m = step_fn(state, pixel_batch, lidar_batch, k_s,
                           pixel_rg=False, lidar_rg=False)
    psnr = float(m["psnr"])  # forces completion
    t_norg = (time.time() - t0) / steps

    # prop-grad variant (every 5th step after warmup,
    # prop_sampler.proposal_requires_grad_schedule)
    rg_steps = max(steps // 2, 1)
    state, m = step_fn(state, pixel_batch, lidar_batch, key,
                       pixel_rg=True, lidar_rg=True)
    float(m["psnr"])  # compile + warmup of the rg variant
    t0 = time.time()
    for i in range(rg_steps):
        key, k_b, k_s = jax.random.split(key, 3)
        pixel_batch, lidar_batch = make_batches(scene, k_b)
        state, m = step_fn(state, pixel_batch, lidar_batch, k_s,
                           pixel_rg=True, lidar_rg=True)
    float(m["psnr"])
    t_rg = (time.time() - t0) / rg_steps

    # steady-state mixture: 4 plain steps + 1 prop-grad step
    t_mixed = (4.0 * t_norg + t_rg) / 5.0

    # Staged lidar-K accounting (ADVICE r3 #3): with the committed default
    # lidar_topk_until=0.9 a real run spends the last 10% of steps on the
    # slower UNPRUNED lidar variant (a second compiled step, like the rg
    # switch).  Time it and weight it into mixed_ms so the default-profile
    # number is what a 25k-iter run actually averages.  Probe runs with
    # BENCH_OVERRIDES skip this (2 extra compiles) unless BENCH_STAGED=1 —
    # they are knob A/Bs against pruned-phase numbers, not the committed
    # default the driver records.
    from emernerf_tpu.train.step import lidar_full_at

    staged_frac = 1.0 - float(getattr(step_cfg, "lidar_topk_until", 1.0))
    staged_on = (
        # the exact condition the trainer uses to switch variants
        lidar_full_at(step_cfg, step_cfg.num_iters - 1)
        and getattr(step_cfg, "has_lidar", False)
        and (os.environ.get("BENCH_STAGED", "1" if not overrides else "0")
             == "1")
    )
    staged = None
    if staged_on:

        t_c1 = time.time()
        state, m = step_fn(state, pixel_batch, lidar_batch, key,
                           pixel_rg=False, lidar_rg=False, lidar_full=True)
        float(m["psnr"])
        compile_full_s = time.time() - t_c1
        t0 = time.time()
        for i in range(steps):
            key, k_b, k_s = jax.random.split(key, 3)
            pixel_batch, lidar_batch = make_batches(scene, k_b)
            state, m = step_fn(state, pixel_batch, lidar_batch, k_s,
                               pixel_rg=False, lidar_rg=False,
                               lidar_full=True)
        float(m["psnr"])
        t_norg_full = (time.time() - t0) / steps
        # the rg-variant surcharge is branch-independent to first order;
        # model rg_full as rg + (norg_full - norg) instead of paying a 4th
        # multi-minute compile for a 1-in-50-step variant (rg in the last
        # 10% of the schedule)
        t_rg_full = t_rg + (t_norg_full - t_norg)
        t_mixed_full = (4.0 * t_norg_full + t_rg_full) / 5.0
        staged = {
            "lidar_topk_until": float(step_cfg.lidar_topk_until),
            "no_rg_full_ms": round(t_norg_full * 1e3, 1),
            "mixed_pruned_ms": round(t_mixed * 1e3, 1),
            "mixed_full_ms": round(t_mixed_full * 1e3, 1),
            "compile_full_s": round(compile_full_s, 1),
            "note": "mixed_ms = (1-f)*pruned + f*full, f=1-lidar_topk_until;"
                    " rg_full modeled as rg + (no_rg_full - no_rg)",
        }
        t_mixed = (1.0 - staged_frac) * t_mixed + staged_frac * t_mixed_full
    rays_per_iter = 2 * ray_batch  # pixel + lidar, as in the reference
    rays_per_sec = rays_per_iter / t_mixed
    n_chips = jax.device_count()
    baseline = 2_000_000.0 * (n_chips / 8.0)  # north star is for 8 chips

    result = {
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 4),
        # breakdown (machine-readable; the stderr comment is for humans)
        "no_rg_ms": round(t_norg * 1e3, 1),
        "rg_ms": round(t_rg * 1e3, 1),
        "mixed_ms": round(t_mixed * 1e3, 1),
        "compile_s": round(compile_s, 1),
        # a handful-of-steps training PSNR: a smoke signal that the step
        # is numerically alive, NOT a quality claim — converged quality
        # lives in the flagship A/Bs (see quality_ref)
        "psnr_smoke": round(psnr, 2),
        "chips": n_chips,
        "work_profile": profile,
        "quality_ref": "perf/QUALITY_r02.json (base=stopk32l16 curve)",
    }
    if staged is not None:
        result["staged_lidar"] = staged
    perf_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "perf")
    if profile != "default":
        # record this profile for embedding into future default runs
        ppath = os.path.join(perf_dir, "BENCH_PROFILES.json")
        merged = {}
        if os.path.exists(ppath):
            with open(ppath) as f:
                merged = json.load(f)
        merged[profile] = {
            k: result[k]
            for k in ("value", "no_rg_ms", "rg_ms", "mixed_ms", "chips")
        }
        with open(ppath + ".tmp", "w") as f:
            json.dump(merged, f, indent=1)
        os.replace(ppath + ".tmp", ppath)
    else:
        # embed previously-recorded profiles + compile probe so the one
        # BENCH line states both work definitions and warm/cold compile
        for fname, field in (("BENCH_PROFILES.json", "reference_profile"),
                             ("COMPILE_PROBE.json", "compile_probe")):
            path = os.path.join(perf_dir, fname)
            if os.path.exists(path):
                with open(path) as f:
                    d = json.load(f)
                result[field] = d.get("reference", d) \
                    if fname == "BENCH_PROFILES.json" else d
    # psnr_smoke floor (round-4 weak #7): ~14 dB after a handful of steps
    # has been stable for three rounds; below 12 means the step is
    # numerically broken, and the bench must FAIL, not record a liveness
    # number nobody reads.  Applies to the committed-default measurement
    # only (probe variants legitimately move early PSNR).
    if not tiny and profile == "default" and not overrides and psnr < 12.0:
        result["error"] = (
            f"psnr_smoke {psnr:.2f} below the 12.0 floor: the default "
            "train step is numerically broken")
        print(json.dumps(result))
        sys.stdout.flush()
        os._exit(3)
    print(json.dumps(result))
    print(
        f"# mixed {t_mixed * 1e3:.1f} ms/step (no-rg {t_norg * 1e3:.1f}, "
        f"rg {t_rg * 1e3:.1f}), compile {compile_s:.1f}s, {n_chips} chip(s), "
        f"psnr {psnr:.2f}",
        file=sys.stderr,
    )
    sys.stdout.flush()
    sys.stderr.flush()


if __name__ == "__main__":
    main()
    # the remote TPU runtime can hang in atexit teardown; results are out
    os._exit(0)
