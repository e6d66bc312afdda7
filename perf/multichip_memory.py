#!/usr/bin/env python
"""Full-size per-chip memory check for the 8-chip flagship step
(VERDICT r4 #6): AOT-compile the REAL-spec train step (316M-param tables,
ZeRO moments, 8192 rays/chip) over an 8-device virtual CPU mesh and
report the compiler's per-device memory analysis, closing the last
scale-out unknown this container can close — does the v5e-8 north-star
configuration actually fit 16 GB/chip HBM?

The partitioned HLO and its buffer assignment are shape-exact: XLA:CPU
and XLA:TPU disagree on fusion boundaries (so the TEMP number is an
estimate), but argument/output sizes (params, optimizer state, batch)
are layout-independent totals.

Usage:  python perf/multichip_memory.py [n_devices] [rays_per_chip]
Writes: a section spliced into perf/MULTICHIP_MODEL.md +
        perf/MULTICHIP_MEMORY.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
V5E_HBM_GB = 16.0


def scan(n: int, rays_per_chip: int) -> dict:
    code = f"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count={n}")
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
from jax.sharding import NamedSharding

from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
from emernerf_tpu.flagship import build_flagship
from emernerf_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from emernerf_tpu.parallel.spmd import SpmdConfig, state_partition_specs
from emernerf_tpu.train.step import build_train_step, init_train_state
from emernerf_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
n = {n}
rb = {rays_per_chip} * n
# FULL-SIZE model (tiny=False): real table/MLP specs, real sample counts
cfg, dataset, model, prop_models, step_cfg = build_flagship(
    tiny=False, overrides=[f"data.ray_batch_size={{rb}}"])
scene = dataset.scene_tensors()
key = jax.random.PRNGKey(0)
pixel = sample_pixel_batch(scene, key, rb, use_timestamps=True)
lidar = sample_lidar_batch(scene, key, rb)
# AOT path: never materialize the 283M-param state on the host — lower()
# accepts ShapeDtypeStructs carrying shardings, and the buffer assignment
# is what we are after (a single CPU core takes ~10 min just to run the
# full-size random init eagerly)
state = jax.eval_shape(
    lambda k, pb: init_train_state(model, prop_models, step_cfg, k, pb),
    key, pixel)
n_params = sum(x.size for x in jax.tree.leaves(state.params))
n_prop = sum(x.size for x in jax.tree.leaves(state.prop_params))
mesh = make_mesh(n)
spmd = SpmdConfig()
specs = state_partition_specs(state, spmd, n)
state = jax.tree.map(
    lambda x, s: jax.ShapeDtypeStruct(
        x.shape, x.dtype, sharding=NamedSharding(mesh, s)),
    state, specs)
rep, shd = replicated_sharding(mesh), batch_sharding(mesh)
pixel = jax.device_put(pixel, shd)
lidar = jax.device_put(lidar, shd)
key = jax.device_put(key, rep)
step = build_train_step(model, prop_models, step_cfg, mesh=mesh, spmd=spmd)
compiled = step.lower(state, pixel, lidar, key,
                      pixel_rg=True, lidar_rg=True).compile()
ma = compiled.memory_analysis()
def g(attr):
    v = getattr(ma, attr, None)
    return int(v) if v is not None else None
# state bytes per chip, from the actual sharded arrays
def shard_bytes(tree):
    total = 0
    for x in jax.tree.leaves(tree):
        if hasattr(x, "sharding"):
            shard_shape = x.sharding.shard_shape(x.shape)
            import numpy as _np
            total += int(_np.prod(shard_shape)) * x.dtype.itemsize
        else:
            total += x.nbytes
    return total
print("MEM_JSON " + json.dumps({{
    "n": n, "rays_per_chip": {rays_per_chip},
    "model_params": int(n_params), "prop_params": int(n_prop),
    "arg_bytes_per_chip": g("argument_size_in_bytes"),
    "out_bytes_per_chip": g("output_size_in_bytes"),
    "temp_bytes_per_chip": g("temp_size_in_bytes"),
    "generated_code_bytes": g("generated_code_size_in_bytes"),
    "alias_bytes_per_chip": g("alias_size_in_bytes"),
    "state_bytes_per_chip": shard_bytes(
        (state.params, state.prop_params, state.opt_state,
         state.prop_opt_state)
        if hasattr(state, "opt_state") else state),
    "scene_bytes": shard_bytes(scene),
}}))
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=7200)
    for line in r.stdout.splitlines():
        if line.startswith("MEM_JSON "):
            return json.loads(line[len("MEM_JSON "):])
    raise RuntimeError(
        f"memory scan failed:\n{r.stdout[-2000:]}\n{r.stderr[-6000:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rays = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    row = scan(n, rays)
    here = os.path.dirname(os.path.abspath(__file__))
    row["platform"] = ("cpu-aot: arg/out/state bytes are layout-exact; "
                       "temp bytes are XLA:CPU's fusion choice, treat as "
                       "an estimate for TPU")
    with open(os.path.join(here, "MULTICHIP_MEMORY.json"), "w") as f:
        json.dump(row, f, indent=1)

    def gb(x):
        return f"{x / 2**30:.2f}" if x is not None else "?"

    arg, tmp = row["arg_bytes_per_chip"], row["temp_bytes_per_chip"]
    state_b = row["state_bytes_per_chip"]
    total = (state_b or 0) + (tmp or 0) + (row.get("scene_bytes") or 0)
    lines = [
        "", f"## Full-size per-chip memory (n={n}, {rays} rays/chip, "
        "cpu-AOT; round 5)", "",
        "| quantity | per chip |", "|---|---|",
        f"| params (model {row['model_params'] / 1e6:.1f}M + prop "
        f"{row['prop_params'] / 1e6:.1f}M) + opt state + scene, sharded | "
        f"{gb(state_b)} GB |",
        f"| executable argument bytes | {gb(arg)} GB |",
        f"| executable temp bytes (XLA:CPU fusion estimate) | {gb(tmp)} GB |",
        f"| scene tensors | {gb(row.get('scene_bytes'))} GB |",
        f"| **state + temps + scene total** | **{gb(total)} GB** |",
        f"| v5e HBM budget | {V5E_HBM_GB:.0f} GB |", "",
        f"Verdict: {'FITS' if total < V5E_HBM_GB * 2**30 else 'DOES NOT FIT'}"
        f" v5e HBM at {rays} rays/chip with headroom factor "
        f"{V5E_HBM_GB * 2**30 / max(total, 1):.1f}x.", "",
    ]
    md_path = os.path.join(here, "MULTICHIP_MODEL.md")
    marker = "## Full-size per-chip memory"
    body = open(md_path).read() if os.path.exists(md_path) else ""
    if marker in body:
        import re as _re

        head, _, tail = body.partition(marker)
        m = _re.search(r"\n#{2,3} ", tail)
        preserved = tail[m.start() + 1:] if m else ""
        body = (head.rstrip("\n") + "\n".join(lines)
                + ("\n" + preserved if preserved else "\n"))
    else:
        body = body.rstrip("\n") + "\n" + "\n".join(lines)
    with open(md_path, "w") as f:
        f.write(body)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
