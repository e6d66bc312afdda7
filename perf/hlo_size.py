#!/usr/bin/env python
"""Where does compile time go?  Trace-level op-count probe (no compile).

Counts jaxpr equations for the brick-grid encode fwd/bwd as levels /
formulation knobs vary, and for the full tiny-flagship train step — the
op count is the first-order driver of XLA compile time (the flagship step
cold-compiles in 300-900 s on v5e, BENCH_r01).

Usage: JAX_PLATFORMS=cpu python perf/hlo_size.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def count_eqns(jaxpr) -> int:
    n = 0
    for eq in jaxpr.eqns:
        n += 1
        for v in eq.params.values():
            if hasattr(v, "jaxpr"):  # nested (pjit/custom_vjp/scan)
                n += count_eqns(v.jaxpr)
            elif isinstance(v, (list, tuple)):
                for vv in v:
                    if hasattr(vv, "jaxpr"):
                        n += count_eqns(vv.jaxpr)
    return n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from emernerf_tpu.ops.brickgrid import (
        BrickGridSpec,
        brickgrid_encode,
        init_brickgrid_table,
    )

    n = 4096
    x3 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (n, 3)), jnp.float32)
    x4 = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (n, 4)), jnp.float32)

    print(f"{'config':<44}{'fwd eqns':>10}{'fwd+bwd':>10}")
    for name, spec, x in [
        ("3D F=4 L=4", BrickGridSpec(3, 4, 16, 8192, 15, 4), x3),
        ("3D F=4 L=10", BrickGridSpec(3, 10, 16, 8192, 15, 4), x3),
        ("4D F=4 L=10 pair", BrickGridSpec(4, 10, 32, 8192, 15, 4,
                                           time_pair=True), x4),
        ("4D L=10 pair sub4",
         BrickGridSpec(4, 10, 32, 8192, 15, 4, time_pair=True,
                       grad_subsample=4), x4),
        ("4D L=10 pair einsum-reduce",
         BrickGridSpec(4, 10, 32, 8192, 15, 4, time_pair=True,
                       reduce_mode="einsum"), x4),
    ]:
        table = init_brickgrid_table(jax.random.PRNGKey(0), spec)

        def fwd(t, p):
            return brickgrid_encode(t, p, spec, True).sum()

        jpr_f = jax.make_jaxpr(
            lambda t, p: brickgrid_encode(t, p, spec, True)
        )(table, x)
        jpr_b = jax.make_jaxpr(jax.grad(fwd, argnums=(0, 1)))(table, x)
        print(f"{name:<44}{count_eqns(jpr_f.jaxpr):>10}"
              f"{count_eqns(jpr_b.jaxpr):>10}")

    # full tiny-flagship fused step
    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship
    from emernerf_tpu.train.step import build_train_step, init_train_state

    cfg, dataset, model, prop_models, step_cfg = build_flagship(tiny=True)
    scene = dataset.scene_tensors()
    key = jax.random.PRNGKey(0)
    rb = cfg.data.ray_batch_size
    pixel = sample_pixel_batch(scene, key, rb, use_timestamps=True)
    lidar = sample_lidar_batch(scene, key, rb)
    state = init_train_state(model, prop_models, step_cfg, key, pixel)
    step = build_train_step(model, prop_models, step_cfg)
    jpr = jax.make_jaxpr(
        lambda s, p, l, k: step.__wrapped__(s, p, l, k, pixel_rg=True,
                                            lidar_rg=True)
        if hasattr(step, "__wrapped__")
        else step(s, p, l, k, pixel_rg=True, lidar_rg=True)
    )(state, pixel, lidar, key)
    print(f"{'FULL tiny-flagship step (rg)':<44}{count_eqns(jpr.jaxpr):>10}")


if __name__ == "__main__":
    main()
