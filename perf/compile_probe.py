#!/usr/bin/env python
"""Warm/cold flagship compile-time measurement (VERDICT r1 #3 / r2 #4).

Compiles the flagship train step twice in SEPARATE subprocesses sharing a
fresh persistent-cache directory: run 1 = cold (empty cache), run 2 = warm
(cache hit).  Writes perf/COMPILE_PROBE.json, which bench.py embeds into
its JSON line as ``compile_probe``.

Remote-compile wall time is volatile (PERF_NOTES round-4 #8: 154-916 s for
the same-shape program), so treat the cold number as one sample, not a
distribution.

Usage: python perf/compile_probe.py   (uses the real chip; ~cold+warm
       compile wall time, no training steps)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import os, sys, time
sys.path.insert(0, ".")
import jax
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    jax.config.update("jax_platforms", _plat)
from emernerf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
from emernerf_tpu.flagship import build_flagship
from emernerf_tpu.train.step import build_train_step, init_train_state
cfg, dataset, model, prop_models, step_cfg = build_flagship()
scene = dataset.scene_tensors()
key = jax.random.PRNGKey(0)
rb = cfg.data.ray_batch_size
pb = jax.jit(lambda s, k: sample_pixel_batch(s, k, rb, use_timestamps=True))(scene, key)
lb = jax.jit(lambda s, k: sample_lidar_batch(s, k, rb))(scene, key)
state = init_train_state(model, prop_models, step_cfg, key, pb)
step = build_train_step(model, prop_models, step_cfg)
t0 = time.time()
step.lower(state, pb, lb, key, pixel_rg=False, lidar_rg=False).compile()
print("COMPILE_S", time.time() - t0)
os._exit(0)
"""


def run_once(cache_dir: str) -> float:
    env = dict(os.environ)
    env["EMERNERF_JAX_CACHE"] = cache_dir
    out = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        ),
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("COMPILE_S"):
            return float(line.split()[1])
    raise RuntimeError(
        f"compile child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    cache = tempfile.mkdtemp(prefix="emernerf_compile_probe_")
    t_wall = time.time()
    cold = run_once(cache)
    warm = run_once(cache)
    result = {
        "compile_cold_s": round(cold, 1),
        "compile_warm_s": round(warm, 1),
        "note": "fresh cache dir; cold=run1, warm=run2 (same program). "
                "Remote-compile wall time is volatile (154-916 s observed "
                "for same-shape programs).",
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "COMPILE_PROBE.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), f"(total {time.time() - t_wall:.0f}s)")


if __name__ == "__main__":
    main()
