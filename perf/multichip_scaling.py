#!/usr/bin/env python
"""Pod-scale collective scaling evidence (VERDICT r3 #4).

AOT-compiles the explicit-collective ZeRO train step (parallel/spmd.py)
at n = 8/16/32/64 virtual CPU devices and scans each partitioned HLO for
collective op counts and ring-model per-chip wire bytes.  The claim being
tested: with reduce-scattered big-table grads + bf16 direction all-gather,
per-chip wire bytes stay ~flat in n (each chip moves B*(n-1)/n per
collective), i.e. the collective cost per step is SUBLINEAR in pod size,
so rays/s scales ~linearly with chips until ICI latency dominates.

The per-device ray batch is held constant (weak scaling, how a pod run is
actually configured: global batch = 8192 * n / 8).  Tiny model shapes keep
CPU compiles tractable; the collective STRUCTURE (which tensors get
reduced, how many ops) is shape-independent, and the full-size byte
projection is analytic from the real table sizes.

Usage:  python perf/multichip_scaling.py [n n ...]   (default 8 16 32 64)
Writes: perf/MULTICHIP_SCALING.json + a section appended to
        perf/MULTICHIP_MODEL.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_LINK_GBPS = 45.0


def scan_one(n: int) -> dict:
    """Run the single-n scan in a SUBPROCESS: the virtual device count is
    fixed at backend init, so each n needs a fresh interpreter."""
    code = f"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count={n}")
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/perf"!r})
import jax
jax.config.update("jax_platforms", "cpu")
from multichip_model import collect_collectives, wire_bytes
from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
from emernerf_tpu.flagship import build_flagship
from emernerf_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from emernerf_tpu.parallel.spmd import SpmdConfig, shard_state
from emernerf_tpu.train.step import build_train_step, init_train_state
from emernerf_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
n = {n}
assert len(jax.devices()) == n, jax.devices()
# per-device ray batch held at 64 (weak scaling)
cfg, dataset, model, prop_models, step_cfg = build_flagship(
    tiny=True, overrides=[f"data.ray_batch_size={{64 * n}}"])
scene = dataset.scene_tensors()
key = jax.random.PRNGKey(0)
rb = cfg.data.ray_batch_size
pixel = sample_pixel_batch(scene, key, rb, use_timestamps=True)
lidar = sample_lidar_batch(scene, key, rb)
state = init_train_state(model, prop_models, step_cfg, key, pixel)
mesh = make_mesh(n)
spmd = SpmdConfig(zero=True, zero_min_elems=1 << 10)
state = shard_state(state, mesh, spmd)
rep, shd = replicated_sharding(mesh), batch_sharding(mesh)
pixel = jax.device_put(pixel, shd)
lidar = jax.device_put(lidar, shd)
key = jax.device_put(key, rep)
step = build_train_step(model, prop_models, step_cfg, mesh=mesh, spmd=spmd)
compiled = step.lower(state, pixel, lidar, key,
                      pixel_rg=True, lidar_rg=True).compile()
colls = []
for mod in compiled.runtime_executable().hlo_modules():
    colls += collect_collectives(mod.to_string())
by_kind = {{}}
for kind, nbytes, _ in colls:
    by_kind.setdefault(kind, [0, 0])
    by_kind[kind][0] += 1
    by_kind[kind][1] += nbytes
per_chip = sum(wire_bytes(k, b, n) for k, b, _ in colls)
print("SCALING_JSON " + json.dumps({{
    "n": n, "ops": {{k: v[0] for k, v in by_kind.items()}},
    "out_bytes": {{k: v[1] for k, v in by_kind.items()}},
    "per_chip_wire_bytes": per_chip,
}}))
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("SCALING_JSON "):
            return json.loads(line[len("SCALING_JSON "):])
    raise RuntimeError(
        f"n={n} scan failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}")


def main():
    ns = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]
    rows = []
    for n in ns:
        print(f"--- scanning n={n} ---", flush=True)
        rows.append(scan_one(n))
        print(rows[-1], flush=True)

    # analytic full-size projection: per-chip wire bytes scale with table
    # params, independent of the tiny-model absolute numbers
    sys.path.insert(0, ".")
    from emernerf_tpu.flagship import build_flagship

    _, _, model, props, _ = build_flagship(tiny=False)
    table_params = (
        model.static_spec.num_parameters
        + (model.dynamic_spec.num_parameters if model.dynamic_spec else 0)
        + (model.flow_spec.num_parameters if model.flow_spec else 0)
        + sum(p.spec.num_parameters for p in props)
    )
    proj = []
    for r in rows:
        n = r["n"]
        # ZeRO big tables: bf16 reduce-scatter (2B*(n-1)/n per chip) +
        # bf16 direction all-gather (2B*(n-1)/n) per step
        b = table_params * 2.0
        per_chip_gb = 2 * b * (n - 1) / n / 1e9
        coll_ms = per_chip_gb / V5E_LINK_GBPS * 1e3
        proj.append({"n": n, "full_size_per_chip_wire_gb": round(per_chip_gb, 3),
                     "collective_ms_at_45GBps": round(coll_ms, 1)})

    out = {"tiny_rows": rows, "full_size_projection": proj,
           "table_params": table_params,
           "note": "weak scaling, 64 rays/device; XLA:CPU canonicalizes "
                   "bf16 collectives to f32 (structure valid, dtype "
                   "factor analytic — see MULTICHIP_MODEL.md caveat)"}
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "MULTICHIP_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)

    lines = ["", "## Scaling scan: explicit ZeRO collectives at n = "
             + "/".join(str(r["n"]) for r in rows)
             + " virtual devices (round 4)", "",
             "Weak scaling (64 rays/device), tiny model, subprocess-fresh "
             "backend per n; ring-model per-chip wire bytes from the "
             "partitioned HLO:", "",
             "| n | collective ops | per-chip wire bytes/step (tiny) |",
             "|---|---|---|"]
    for r in rows:
        ops = ", ".join(f"{k}:{v}" for k, v in sorted(r["ops"].items()))
        lines.append(f"| {r['n']} | {ops} | {r['per_chip_wire_bytes'] / 1e3:.1f} KB |")
    lines += ["", "Full-size analytic projection (real table params = "
              f"{table_params / 1e6:.1f}M, bf16 ZeRO reduce-scatter + "
              "all-gather, 45 GB/s/link):", "",
              "| n | per-chip wire GB/step | collective ms/step |",
              "|---|---|---|"]
    for p in proj:
        lines.append(f"| {p['n']} | {p['full_size_per_chip_wire_gb']} | "
                     f"{p['collective_ms_at_45GBps']} |")
    lines += ["", "Verdict: see MULTICHIP_SCALING.json; sublinear iff "
              "op counts are flat in n and per-chip bytes ~B(n-1)/n.", ""]
    # replace any previous scan section IN PLACE instead of appending a
    # duplicate (re-runs after a flake must not leave two conflicting
    # tables, and hand-written sections after the scan — e.g. "### Verdict
    # (round 4)" — must stay AFTER the tables they interpret)
    marker = "## Scaling scan: explicit ZeRO collectives"
    md_path = os.path.join(here, "MULTICHIP_MODEL.md")
    new_section = "\n".join(lines)
    body = ""
    if os.path.exists(md_path):
        body = open(md_path).read()
    if marker in body:
        import re as _re

        head, _, tail = body.partition(marker)
        # the old section runs to the next heading of ANY level; splice
        # the regenerated section back at the marker position so the
        # preserved tail keeps following it
        m = _re.search(r"\n#{2,3} ", tail)
        preserved = tail[m.start() + 1:] if m else ""
        body = (head.rstrip("\n") + new_section
                + ("\n" + preserved if preserved else "\n"))
    else:
        body = body.rstrip("\n") + "\n" + new_section
    with open(md_path, "w") as f:
        f.write(body)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
