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
    positions = origins[:, None, :] + viewdirs[:, None, :] * mid[..., None]
    directions = jnp.broadcast_to(viewdirs[:, None, :], positions.shape)

    data = {}
    for k in _EXPAND_KEYS:
        if k in rays and rays[k] is not None:
            data[k] = jnp.broadcast_to(rays[k][:, None], (n_rays, s))
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
    results = composite_rays(
        t_starts, t_ends, field_out, return_decomposition=return_decomposition
    )
    return results, caches, s_vals_final
