"""Proposal-network importance sampling (Mip-NeRF 360 style) + interlevel
losses, as pure functions.

Functional re-design of the reference PropNetEstimator
(/root/reference/third_party/nerfacc_prop_net.py:63-277).  The stateful
``prop_cache`` becomes explicit return values; ``requires_grad`` becomes a
static flag that controls where ``stop_gradient`` is placed (the reference
runs sampling under ``no_grad`` and re-enables grad only for the cached
proposal CDFs, nerfacc_prop_net.py:89,162-170).
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from emernerf_tpu.ops.stepfuns import (
    blur_stepfun,
    importance_sampling,
    pdf_outer_loss,
    render_transmittance_from_density,
    sorted_interp_quad,
    transform_stot,
)


class PropCache(NamedTuple):
    """Cached per-level proposal outputs for the interlevel loss."""

    s_vals: jnp.ndarray  # (R, K+1) interval edges in s-space (detached)
    cdfs: jnp.ndarray  # (R, K+1) CDF at those edges (grad flows to propnet)
    level: int


def sample_along_rays(
    key,
    prop_sigma_fns: Sequence[Callable],
    prop_samples: Sequence[int],
    num_samples: int,
    n_rays: int,
    near_plane: float,
    far_plane: float,
    sampling_type: str = "uniform_lindisp",
    stratified: bool = False,
    requires_grad: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, List[PropCache]]:
    """Hierarchical proposal sampling (nerfacc_prop_net.py:89-179).

    prop_sigma_fns: callables (t_starts, t_ends) -> densities (R, S).
    Returns (t_starts, t_ends, s_vals_final, caches); the returned t's carry
    no gradient (sampling is a detached operation, as in the reference).
    """
    cdfs = jnp.concatenate(
        [jnp.zeros((n_rays, 1)), jnp.ones((n_rays, 1))], axis=-1
    )
    s_vals = cdfs  # [0, 1] edges
    caches: List[PropCache] = []

    for level, (fn, n) in enumerate(zip(prop_sigma_fns, prop_samples)):
        key, sub = jax.random.split(key)
        s_vals = importance_sampling(s_vals, cdfs, n, stratified, sub)
        s_vals = jax.lax.stop_gradient(s_vals)
        t_vals = transform_stot(sampling_type, s_vals, near_plane, far_plane)
        t_starts, t_ends = t_vals[..., :-1], t_vals[..., 1:]

        sigmas = fn(t_starts, t_ends)
        if not requires_grad:
            sigmas = jax.lax.stop_gradient(sigmas)
        trans, _ = render_transmittance_from_density(t_starts, t_ends, sigmas)
        cdfs_grad = 1.0 - jnp.concatenate(
            [trans, jnp.zeros_like(trans[..., :1])], axis=-1
        )
        if requires_grad:
            caches.append(PropCache(s_vals, cdfs_grad, level))
        # sampling of the next level never backprops through the CDF
        cdfs = jax.lax.stop_gradient(cdfs_grad)

    key, sub = jax.random.split(key)
    s_vals = jax.lax.stop_gradient(
        importance_sampling(s_vals, cdfs, num_samples, stratified, sub)
    )
    t_vals = transform_stot(sampling_type, s_vals, near_plane, far_plane)
    return t_vals[..., :-1], t_vals[..., 1:], s_vals, caches


def compute_prop_loss(
    caches: Sequence[PropCache],
    s_vals_final: jnp.ndarray,
    trans_final: jnp.ndarray,
    enable_anti_aliasing: bool = True,
    pulse_widths: Sequence[float] = (0.03, 0.003),
    loss_scaler: float = 1.0,
) -> jnp.ndarray:
    """Interlevel loss supervising the proposal networks with the final
    render's (detached) distribution (nerfacc_prop_net.py:181-238).

    With anti-aliasing enabled this is the zip-NeRF blurred-stepfun loss with
    a per-level pulse width; otherwise the mip-NeRF 360 outer-envelope loss.
    """
    if not caches:
        return jnp.zeros(())

    trans_final = jax.lax.stop_gradient(trans_final)
    cdfs = 1.0 - jnp.concatenate(
        [trans_final, jnp.zeros_like(trans_final[..., :1])], axis=-1
    )

    loss = jnp.zeros(())
    if enable_anti_aliasing:
        w_normalize = (cdfs[..., 1:] - cdfs[..., :-1]) / (
            s_vals_final[..., 1:] - s_vals_final[..., :-1]
        )
        cs, ws, blurred_cdfs = [], [], []
        for r in pulse_widths:
            c, w = blur_stepfun(s_vals_final, w_normalize, r)
            area = 0.5 * (w[..., 1:] + w[..., :-1]) * (c[..., 1:] - c[..., :-1])
            blurred = jnp.concatenate(
                [jnp.zeros_like(area[..., :1]), jnp.cumsum(area, axis=-1)], axis=-1
            )
            cs.append(c)
            ws.append(w)
            blurred_cdfs.append(blurred)
        for cache in caches:
            wp = cache.cdfs[..., 1:] - cache.cdfs[..., :-1]
            cdf_interp = sorted_interp_quad(
                cache.s_vals, cs[cache.level], ws[cache.level],
                blurred_cdfs[cache.level],
            )
            w_s = cdf_interp[..., 1:] - cdf_interp[..., :-1]
            loss = loss + (
                jnp.clip(w_s - wp, min=0.0) ** 2 / (wp + 1e-5)
            ).mean()
    else:
        for cache in caches:
            loss = loss + pdf_outer_loss(
                s_vals_final, cdfs, cache.s_vals, cache.cdfs
            ).mean()
    return loss * loss_scaler


def proposal_requires_grad_schedule(target: float = 5.0, num_steps: int = 1000):
    """Host-side stateful schedule deciding when proposal nets get gradients
    (nerfacc_prop_net.py:280-296).  Called once per render (twice per train
    iter when lidar supervision is on), exactly like the reference."""
    state = {"since": 0}

    def fn(step: int) -> bool:
        target_since = min(step / num_steps, 1.0) * target
        requires = state["since"] > target_since
        if requires:
            state["since"] = 0
        state["since"] += 1
        return requires

    return fn
