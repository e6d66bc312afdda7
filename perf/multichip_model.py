#!/usr/bin/env python
"""Multi-chip step cost model (VERDICT round-1 #7).

Measures, on the 8-device virtual CPU mesh, which collectives XLA's SPMD
partitioner actually inserts into the sharded flagship train step
(parallel/mesh.py:shard_train_step): AOT-compiles the jitted step with the
wrapper's shardings (state replicated, ray batches sharded) and scans the
partitioned HLO for all-reduce / all-gather / reduce-scatter ops, summing
their byte sizes.  The tiny-flagship collective *structure* (which tensors
get reduced) is shape-independent; the report scales the measured inventory
to the full-size table shapes and divides by v5e ICI all-reduce bandwidth to
model the 8-chip step, then states the replicated-DP verdict.

Usage:  python perf/multichip_model.py          (forces cpu + 8 devices)
Writes: perf/MULTICHIP_MODEL.md
"""

from __future__ import annotations

import os
import re
import sys

# env mutation only when run as a script: multichip_scaling.py imports
# this module for its HLO-scan helpers with a DIFFERENT device count, and
# a second --xla_force_host_platform_device_count appended here would win
if __name__ == "__main__":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

sys.path.insert(0, ".")

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "u8": 1,
               "s8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

# one v5e chip: ~45 GB/s usable per ICI link per direction; a 1-D ring
# all-reduce of B bytes moves ~2B(n-1)/n through each chip's link pair.
V5E_LINK_GBPS = 45.0
N_CHIPS = 8


def tensor_bytes(shape_str: str) -> int:
    """'f32[1310720,108]' -> bytes."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def collect_collectives(hlo_text: str):
    out = []
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(
            r"(?:ROOT\s+)?%?\S+\s*=\s*"
            r"((?:\([^)]*\))|(?:\w+\[[\d,]*\]\S*))\s*"
            r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
            r"collective-permute)",
            line,
        )
        if not m:
            continue
        shapes, kind = m.groups()
        total = sum(
            tensor_bytes(s) for s in re.findall(r"\w+\[[\d,]*\]", shapes)
        )
        out.append((kind, total, line[:140]))
    return out


def wire_bytes(kind: str, out_bytes: int, n: int = N_CHIPS) -> float:
    """Ring-algorithm bytes through each chip's link pair, from the op's
    OUTPUT size: all-reduce moves 2B(n-1)/n, all-gather B(n-1)/n, and
    reduce-scatter (output B/n per chip, input B) B(n-1)/n = out*(n-1)."""
    if kind == "all-reduce":
        return 2 * out_bytes * (n - 1) / n
    if kind == "reduce-scatter":
        return out_bytes * (n - 1)
    return out_bytes * (n - 1) / n


def main():
    import jax

    # env alone is not enough: the container's sitecustomize registers the
    # axon TPU backend in every process before this module body runs
    jax.config.update("jax_platforms", "cpu")

    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship
    from emernerf_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    from emernerf_tpu.train.step import build_train_step, init_train_state

    assert len(jax.devices()) == 8, jax.devices()
    cfg, dataset, model, prop_models, step_cfg = build_flagship(tiny=True)
    scene = dataset.scene_tensors()
    key = jax.random.PRNGKey(0)
    rb = cfg.data.ray_batch_size
    pixel = sample_pixel_batch(scene, key, rb, use_timestamps=True)
    lidar = sample_lidar_batch(scene, key, rb)
    state = init_train_state(model, prop_models, step_cfg, key, pixel)
    step = build_train_step(model, prop_models, step_cfg)  # jitted

    mesh = make_mesh(8)
    rep, shd = replicated_sharding(mesh), batch_sharding(mesh)
    a_state = jax.device_put(state, rep)
    a_pixel = jax.device_put(pixel, shd)
    a_lidar = jax.device_put(lidar, shd)
    a_key = jax.device_put(key, rep)
    compiled = step.lower(
        a_state, a_pixel, a_lidar, a_key, pixel_rg=True, lidar_rg=True
    ).compile()

    colls = []
    for mod in compiled.runtime_executable().hlo_modules():
        colls += collect_collectives(mod.to_string())

    # --- explicit-collective path (parallel/spmd.py): bf16 psum + ZeRO ---
    from emernerf_tpu.parallel.spmd import SpmdConfig, shard_state

    spmd = SpmdConfig(zero=True, zero_min_elems=1 << 10)
    z_state = shard_state(jax.tree.map(lambda x: x, state), mesh, spmd)
    z_step = build_train_step(model, prop_models, step_cfg, mesh=mesh,
                              spmd=spmd)
    z_compiled = z_step.lower(
        z_state, a_pixel, a_lidar, a_key, pixel_rg=True, lidar_rg=True
    ).compile()
    z_colls = []
    for mod in z_compiled.runtime_executable().hlo_modules():
        z_colls += collect_collectives(mod.to_string())

    by_kind = {}
    biggest = sorted(colls, key=lambda c: -c[1])[:6]
    for kind, nbytes, _ in colls:
        by_kind.setdefault(kind, [0, 0])
        by_kind[kind][0] += 1
        by_kind[kind][1] += nbytes
    z_by_kind = {}
    for kind, nbytes, _ in z_colls:
        z_by_kind.setdefault(kind, [0, 0])
        z_by_kind[kind][0] += 1
        z_by_kind[kind][1] += nbytes

    lines = ["# Multi-chip step: measured collectives + cost model", ""]
    lines.append(
        "AOT-compiled the sharded tiny-flagship train step on the 8-device "
        "virtual CPU mesh (state replicated, ray batches sharded on the "
        "leading axis) and scanned the partitioned HLO:\n"
    )
    for kind, (cnt, nbytes) in sorted(by_kind.items()):
        lines.append(
            f"- {kind}: {cnt} ops, {nbytes / 1e6:.2f} MB/step (tiny shapes)"
        )
    if not by_kind:
        lines.append("- (no collectives found — check HLO extraction)")
    lines.append("")
    if biggest:
        lines.append("Largest collectives (tiny shapes):")
        for kind, nbytes, txt in biggest:
            lines.append(f"- {nbytes / 1e3:.1f} KB {kind}: `{txt}`")
        lines.append("")

    imp_bytes = sum(wire_bytes(k, b) for k, b, _ in colls)
    exp_bytes = sum(wire_bytes(k, b) for k, b, _ in z_colls)
    lines += [
        "## Explicit-collective path (parallel/spmd.py: bf16 psum + ZeRO)",
        "",
        "Same step AOT-compiled via the shard_map path "
        "(grad_psum_dtype=bfloat16, zero=true, direction_dtype=bfloat16):",
        "",
    ]
    for kind, (cnt, nbytes) in sorted(z_by_kind.items()):
        lines.append(
            f"- {kind}: {cnt} ops, {nbytes / 1e6:.2f} MB/step (tiny shapes)"
        )
    lines += [
        "",
        f"Ring-model wire bytes per chip (as compiled for CPU): implicit "
        f"fp32 path {imp_bytes / 1e6:.2f} MB vs explicit ZeRO "
        f"{exp_bytes / 1e6:.2f} MB per step.  CAVEAT: XLA:CPU "
        "canonicalizes the bf16 collectives back to f32 (the HLO shows "
        "convert fusions around every reduce-scatter/all-gather), so the "
        "virtual-mesh measurement validates the STRUCTURE — one "
        "reduce-scatter + one direction all-gather per big table per "
        "branch, no full-gradient all-reduce — while the dtype factor is "
        "analytic: fp32 all-reduce moves 8 B/param/branch, bf16 "
        "reduce-scatter + bf16 all-gather 3.5 B/param/branch, a 2.3x "
        "wire cut on ICI (where bf16 collectives are native).  Per-chip "
        "optimizer-moment HBM for the routed tables additionally drops "
        "8x (sharded mu/nu), and the Adam update math shrinks 8x.",
        "",
    ]

    # analytic scale-up to full-size tables
    _, _, full_model, full_props, _ = build_flagship(tiny=False)
    table_params = (
        full_model.static_spec.num_parameters
        + (full_model.dynamic_spec.num_parameters
           if full_model.dynamic_spec else 0)
        + (full_model.flow_spec.num_parameters
           if full_model.flow_spec else 0)
        + sum(p.spec.num_parameters for p in full_props)
    )
    grad_gb = table_params * 4 / 1e9
    ar_ms = 2 * grad_gb * (N_CHIPS - 1) / N_CHIPS / V5E_LINK_GBPS * 1e3
    lines += [
        "## Scale-up to full-size tables (v5e-8, replicated-table DP)",
        "",
        f"- full-size table params: {table_params / 1e6:.1f}M -> fp32 grad "
        f"all-reduce payload {grad_gb:.2f} GB/step",
        f"- ring all-reduce at ~{V5E_LINK_GBPS:.0f} GB/s/link: "
        f"~{ar_ms:.0f} ms/step fp32, ~{ar_ms / 2:.0f} ms bf16",
        "",
    ]
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "MULTICHIP_MODEL.md"
    )
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
