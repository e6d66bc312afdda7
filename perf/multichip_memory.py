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


def scan(n: int, rays_per_chip: int, remat: bool = False) -> dict:
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
    tiny=False, overrides=[f"data.ray_batch_size={{rb}}",
                           "optim.remat={remat}"])
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
    "n": n, "rays_per_chip": {rays_per_chip}, "remat": {remat},
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
    # sweep the two levers that set the per-chip footprint: rays/chip and
    # rematerialization; reuse rows already scanned (each scan is a ~7-min
    # single-core AOT compile)
    want = [(8192, False), (8192, True), (4096, False)]
    here = os.path.dirname(os.path.abspath(__file__))
    json_path = os.path.join(here, "MULTICHIP_MEMORY.json")
    rows = []
    if os.path.exists(json_path):
        prev = json.load(open(json_path))
        rows = prev["rows"] if isinstance(prev, dict) and "rows" in prev \
            else [prev]  # legacy single-row file
    have = {(r["rays_per_chip"], bool(r.get("remat", False))) for r in rows}
    for rays, remat in want:
        if (rays, remat) in have:
            continue
        rows.append(scan(n, rays, remat))
        with open(json_path, "w") as f:  # persist incrementally
            json.dump({"rows": rows, "platform": (
                "cpu-aot: arg/out/state bytes are layout-exact; temp bytes "
                "are XLA:CPU's fusion choice, treat as an estimate for TPU"
            )}, f, indent=1)
    rows.sort(key=lambda r: (-r["rays_per_chip"], bool(r.get("remat"))))
    with open(json_path, "w") as f:
        json.dump({"rows": rows, "platform": (
            "cpu-aot: arg/out/state bytes are layout-exact; temp bytes are "
            "XLA:CPU's fusion choice, treat as an estimate for TPU"
        )}, f, indent=1)

    def gb(x):
        return f"{x / 2**30:.2f}" if x is not None else "?"

    r0 = rows[0]
    lines = [
        "", f"## Full-size per-chip memory (n={n}, cpu-AOT; round 5)", "",
        f"Real-spec tables (model {r0['model_params'] / 1e6:.1f}M + prop "
        f"{r0['prop_params'] / 1e6:.1f}M params) with ZeRO-sharded Adam "
        "moments, sharded state measured from the actual shard shapes; "
        "temp bytes are XLA:CPU's buffer assignment (fusion boundaries "
        "differ on TPU — treat as an estimate).", "",
        "| rays/chip | remat | state GB | temp GB | total GB | "
        f"fits {V5E_HBM_GB:.0f} GB v5e HBM? |",
        "|---|---|---|---|---|---|",
    ]
    for row in rows:
        state_b = row["state_bytes_per_chip"]
        tmp = row["temp_bytes_per_chip"]
        total = (state_b or 0) + (tmp or 0) + (row.get("scene_bytes") or 0)
        fits = "yes" if total < V5E_HBM_GB * 2**30 else "**no**"
        lines.append(
            f"| {row['rays_per_chip']} | "
            f"{'on' if row.get('remat') else 'off'} | {gb(state_b)} | "
            f"{gb(tmp)} | **{gb(total)}** | {fits} "
            f"({V5E_HBM_GB * 2**30 / max(total, 1):.1f}x headroom) |")
    lines += [
        "",
        "North-star consequence: the v5e-8 full-size configuration runs at "
        "**4096 rays/chip**, not 8192 — same rays/s at roughly half the "
        "step time, so the MULTICHIP_MODEL rate projections stand, but any "
        "per-step-overhead term (collectives, dispatch) is paid 2x per "
        "epoch. Note the remat=on row is LARGER under XLA:CPU: its buffer "
        "assignment does not realize the recompute savings (CPU fuses "
        "differently and keeps both the checkpointed and recomputed "
        "buffers live); on TPU remat is still the lever to try first if "
        "8192 rays/chip is wanted, but this probe cannot confirm it.", "",
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
