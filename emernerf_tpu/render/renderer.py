"""Ray-batch rendering: proposal sampling -> field query -> compositing.

Functional equivalent of the reference ``render_rays``
(/root/reference/radiance_fields/render_utils.py:290-389).  Operates on one
statically-shaped ray batch; chunking for full-image eval lives in
emernerf_tpu.eval.  Per-ray metadata (timestamps, embedding indices) is
expanded to (R, S) exactly as the reference's ``repeat_interleave`` closures
do (render_utils.py:316-341).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from emernerf_tpu.render.prop_sampler import sample_along_rays
from emernerf_tpu.render.volrend import composite_rays

# per-ray keys the field consumes, expanded to (R, S)
_EXPAND_KEYS = ("normed_timestamps", "img_idx", "cam_idx")


def _topk_sample_select(key, prop_fn, t_starts, t_ends, k: int, temp: float):
    """Order-preserving top-K sample selection (TPU-native empty-space skip).

    The CUDA reference skips empty space with nerfacc's occupancy grid /
    early ray termination (dynamic shapes); the static-shape equivalent here
    estimates per-sample contribution weights from the LAST proposal network
    evaluated at the final sample intervals (a cheap F=1 gather, no
    backward), keeps the K highest-weight samples per ray, and evaluates the
    expensive radiance field only there.  ``temp > 0`` adds Gumbel noise to
    the selection scores so pruned regions still get occasional gradient
    (the same exploration fix nerfacc applies by periodically re-sampling
    its occupancy grid).

    Returns ``(onehot (R,K,S) float32, est_weights (R,S))``; the one-hot is
    row-sorted by sample index so downstream compositing stays t-ordered.
    """
    sigma_p = jax.lax.stop_gradient(prop_fn(t_starts, t_ends))
    if sigma_p.ndim == 3:
        sigma_p = sigma_p[..., 0]
    delta = t_ends - t_starts
    alpha = 1.0 - jnp.exp(-sigma_p * delta)
    trans = jnp.concatenate(
        [
            jnp.ones_like(alpha[..., :1]),
            jnp.cumprod(1.0 - alpha[..., :-1] + 1e-10, axis=-1),
        ],
        axis=-1,
    )
    w = trans * alpha  # (R, S) estimated contribution
    scores = jnp.log(w + 1e-12)
    if temp > 0.0:
        gumbel = -jnp.log(
            -jnp.log(jax.random.uniform(key, w.shape) + 1e-12) + 1e-12
        )
        scores = scores + temp * gumbel
    _, idx = jax.lax.top_k(scores, k)  # (R, K), value-ordered
    idx = jnp.sort(idx, axis=-1)  # restore t-order
    onehot = (
        idx[:, :, None] == jnp.arange(w.shape[-1], dtype=idx.dtype)[None, None, :]
    ).astype(jnp.float32)
    return onehot, w


def render_ray_batch(
    model,
    params,
    prop_models: Sequence,
    prop_params: Sequence,
    rays: Dict[str, jnp.ndarray],
    key,
    *,
    num_samples: int = 64,
    prop_samples: Sequence[int] = (128, 64),
    near_plane: float = 0.1,
    far_plane: float = 1000.0,
    sampling_type: str = "uniform_lindisp",
    stratified: bool = False,
    proposal_requires_grad: bool = False,
    return_decomposition: bool = False,
    is_lidar: bool = False,
    train: bool = False,
    rngs: Optional[dict] = None,
    remat: bool = False,
    sample_topk: int = 0,
    sample_topk_temp: float = 0.0,
):
    """Render one ray batch.

    rays: dict with "origins" (R,3), "viewdirs" (R,3) and optional per-ray
    metadata ("normed_timestamps", "img_idx", "cam_idx", "pixel_coords").
    Returns (results_dict, prop_caches, s_vals_final).
    """
    origins = rays["origins"]
    viewdirs = rays["viewdirs"]
    n_rays = origins.shape[0]

    def make_prop_fn(pm, pp):
        def fn(t_starts, t_ends):
            mid = (t_starts + t_ends) / 2.0
            pos = origins[:, None, :] + viewdirs[:, None, :] * mid[..., None]
            return pm.apply({"params": pp}, pos)

        return fn

    prop_fns = [make_prop_fn(pm, pp) for pm, pp in zip(prop_models, prop_params)]

    t_starts, t_ends, s_vals_final, caches = sample_along_rays(
        key,
        prop_fns,
        prop_samples,
        num_samples,
        n_rays,
        near_plane,
        far_plane,
        sampling_type=sampling_type,
        stratified=stratified,
        requires_grad=proposal_requires_grad,
    )

    s = t_starts.shape[-1]
    mid = (t_starts + t_ends) / 2.0

    # top-K sample pruning: query the field only at the K samples the last
    # proposal net predicts will carry contribution, then scatter outputs
    # back to (R, S) so compositing and every loss stay unchanged (off-mask
    # density is exactly 0 and contributes nothing)
    prune = bool(sample_topk) and 0 < sample_topk < s and prop_fns
    if prune:
        # sample_along_rays consumed `key` internally; fold for a fresh one
        k_sel = jax.random.fold_in(key, 0x5E1)
        onehot, _ = _topk_sample_select(
            k_sel, prop_fns[-1], t_starts, t_ends, sample_topk,
            sample_topk_temp,
        )
        mid_q = jnp.einsum("rks,rs->rk", onehot, mid)
        s_q = sample_topk
    else:
        mid_q = mid
        s_q = s
    positions = origins[:, None, :] + viewdirs[:, None, :] * mid_q[..., None]
    directions = jnp.broadcast_to(viewdirs[:, None, :], positions.shape)

    data = {}
    for k in _EXPAND_KEYS:
        if k in rays and rays[k] is not None:
            # per-ray metadata is constant along the sample axis, so the
            # pruned query just broadcasts to (R, K) instead of (R, S)
            data[k] = jnp.broadcast_to(rays[k][:, None], (n_rays, s_q))
    if "pixel_coords" in rays and rays["pixel_coords"] is not None:
        data["pixel_coords"] = rays["pixel_coords"]

    def apply_field(params, positions, directions, data, rngs):
        return model.apply(
            {"params": params},
            positions,
            directions,
            data,
            return_density_only=is_lidar,
            train=train,
            rngs=rngs,
        )

    if remat:
        # recompute the field query in the backward pass instead of holding
        # every head's activations for 8192x64 samples (HBM pressure)
        apply_field = jax.checkpoint(apply_field)
    field_out = apply_field(params, positions, directions, data, rngs)
    if prune:
        field_out = _scatter_back(field_out, onehot, n_rays, sample_topk)
    results = composite_rays(
        t_starts, t_ends, field_out, return_decomposition=return_decomposition
    )
    return results, caches, s_vals_final


# field-output keys that are PER-RAY (not per-sample): never scatter these
# back over the sample axis — a (R, K)-shaped heuristic would misfire on
# e.g. rgb_sky's (R, 3) when K happens to equal the trailing dim
_PER_RAY_KEYS = frozenset({"rgb_sky", "dino_sky_feat"})


def _scatter_back(field_out, onehot, n_rays: int, k: int):
    """Expand every per-sample (R, K, ...) field output back to (R, S, ...)
    with zeros at pruned samples (one MXU einsum per leaf; R*K*S one-hot
    contractions measured at a few ms, PERF_NOTES round-4).  Per-ray
    outputs (_PER_RAY_KEYS) pass through unchanged."""

    def expand(x):
        if x.ndim >= 2 and x.shape[0] == n_rays and x.shape[1] == k:
            oh = onehot.astype(x.dtype)
            if x.ndim == 2:
                return jnp.einsum("rks,rk->rs", oh, x)
            return jnp.einsum(
                "rks,rkf->rsf", oh, x.reshape(n_rays, k, -1)
            ).reshape((n_rays, onehot.shape[-1]) + x.shape[2:])
        return x

    return {
        key: (v if key in _PER_RAY_KEYS else jax.tree.map(expand, v))
        for key, v in field_out.items()
    }
