"""Volume rendering / alpha compositing on dense (R, S) sample arrays.

Replaces the nerfacc CUDA compositing path of the reference
(/root/reference/radiance_fields/render_utils.py:19-287) with closed-form
XLA: transmittance = exp(-exclusive_cumsum(sigma*dt)), weighted reductions
over the fixed samples axis.  Everything fuses into a handful of elementwise
+ reduce ops on TPU; no ragged packing.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from emernerf_tpu.ops.stepfuns import (
    accumulate_along_rays,
    render_transmittance_from_density,
)


def weights_opacity_depth_from_density(t_starts, t_ends, density):
    """(render_utils.py:19-45)."""
    trans, alphas = render_transmittance_from_density(t_starts, t_ends, density)
    weights = trans * alphas
    opacity = jnp.clip(accumulate_along_rays(weights), 1e-6, 1.0)
    depth = accumulate_along_rays(
        weights, ((t_starts + t_ends) / 2.0)[..., None]
    ) / opacity
    return weights, opacity, depth


def composite_rays(
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    results: Dict[str, jnp.ndarray],
    return_decomposition: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Composite per-sample field outputs along rays
    (render_utils.py:48-287). ``results`` is the field-query dict; returns a
    dict of per-ray quantities plus an ``extras`` sub-dict used by losses."""
    density = results["density"]
    trans, alphas = render_transmittance_from_density(t_starts, t_ends, density)
    weights = trans * alphas

    extras = {
        "weights": weights,
        "trans": trans,
        "t_vals": (t_starts + t_ends) / 2.0,
        "t_dist": t_ends - t_starts,
        "density": density,
    }
    for k in (
        "forward_flow",
        "backward_flow",
        "forward_pred_backward_flow",
        "backward_pred_forward_flow",
        "agg_mask",
    ):
        if k in results:
            extras[k] = results[k]

    # ---------- geometry ----------
    opacity = jnp.clip(accumulate_along_rays(weights), 1e-6, 1.0)
    steps = (t_starts + t_ends) / 2.0
    depth = accumulate_along_rays(weights, steps[..., None]) / opacity

    cum_weights = jnp.cumsum(weights, axis=-1)
    median_index = jnp.clip(
        _row_searchsorted(cum_weights, 0.5), 0, steps.shape[-1] - 1
    )
    median_depth = jnp.take_along_axis(steps, median_index, axis=-1)

    out: Dict[str, jnp.ndarray] = {
        "depth": depth,
        "opacity": opacity,
        "median_depth": median_depth,
    }

    # ---------- static / dynamic decomposition ----------
    has_decomp = "static_density" in results and "dynamic_density" in results
    if has_decomp:
        extras["static_density"] = results["static_density"]
        extras["dynamic_density"] = results["dynamic_density"]
        static_ratio = results["static_density"] / (density + 1e-6)
        dynamic_ratio = results["dynamic_density"] / (density + 1e-6)
        if return_decomposition:
            static_weights, static_opacity, static_depth = (
                weights_opacity_depth_from_density(
                    t_starts, t_ends, results["static_density"]
                )
            )
            out["static_opacity"] = static_opacity
            out["static_depth"] = static_depth
            dynamic_weights, dynamic_opacity, dynamic_depth = (
                weights_opacity_depth_from_density(
                    t_starts, t_ends, results["dynamic_density"]
                )
            )
            out["dynamic_opacity"] = dynamic_opacity
            out["dynamic_depth"] = dynamic_depth

    # ---------- rgb ----------
    if "rgb" in results:
        out["rgb"] = accumulate_along_rays(weights, results["rgb"])
    elif "static_rgb" in results and "dynamic_rgb" in results:
        shadow_ratio = 0.0
        if "shadow_ratio" in results:
            shadow_ratio = results["shadow_ratio"]
            out["shadow_ratio"] = accumulate_along_rays(
                weights, jnp.square(shadow_ratio)
            )
        rgb = (
            static_ratio[..., None] * results["static_rgb"] * (1.0 - shadow_ratio)
            + dynamic_ratio[..., None] * results["dynamic_rgb"]
        )
        out["rgb"] = accumulate_along_rays(weights, rgb)

        if return_decomposition:
            out["static_rgb"] = accumulate_along_rays(
                static_weights, results["static_rgb"]
            )
            if "shadow_ratio" in results:
                out["shadow_reduced_static_rgb"] = accumulate_along_rays(
                    static_weights, results["static_rgb"] * (1.0 - shadow_ratio)
                )
                shadow_only = accumulate_along_rays(
                    static_weights, results["static_rgb"] * shadow_ratio
                )
                acc_shadow = accumulate_along_rays(weights, shadow_ratio)
                out["shadow_only_static_rgb"] = shadow_only + (1.0 - acc_shadow)
                out["shadow"] = acc_shadow
            out["dynamic_rgb"] = accumulate_along_rays(
                dynamic_weights, results["dynamic_rgb"]
            )
            if "forward_flow" in results:
                out["forward_flow"] = accumulate_along_rays(
                    dynamic_weights, results["forward_flow"]
                )
                out["backward_flow"] = accumulate_along_rays(
                    dynamic_weights, results["backward_flow"]
                )

    # ---------- sky composition ----------
    if "rgb_sky" in results:
        out["rgb"] = out["rgb"] + results["rgb_sky"] * (1.0 - opacity)
        if "static_rgb" in out:
            out["static_rgb"] = out["static_rgb"] + results["rgb_sky"] * (
                1.0 - out["static_opacity"]
            )

    # ---------- features ----------
    if "dino_feat" in results:
        out["dino_feat"] = accumulate_along_rays(weights, results["dino_feat"])
        _compose_feature_extras(out, results, opacity)
    elif "static_dino_feat" in results and "dynamic_dino_feat" in results:
        dino_feat = (
            static_ratio[..., None] * results["static_dino_feat"]
            + dynamic_ratio[..., None] * results["dynamic_dino_feat"]
        )
        out["dino_feat"] = accumulate_along_rays(weights, dino_feat)
        _compose_feature_extras(out, results, opacity)
        if return_decomposition:
            out["static_dino"] = accumulate_along_rays(
                static_weights, results["static_dino_feat"]
            )
            out["dynamic_dino"] = accumulate_along_rays(
                dynamic_weights, results["dynamic_dino_feat"]
            )
            if "dino_sky_feat" in results:
                out["static_dino"] = out["static_dino"] + results["dino_sky_feat"] * (
                    1.0 - opacity
                )

    out["extras"] = extras
    return out


def _compose_feature_extras(out, results, opacity):
    """Sky feature composition + learnable-PE decomposition
    (render_utils.py:232-244)."""
    if "dino_sky_feat" in results:
        out["dino_feat"] = out["dino_feat"] + results["dino_sky_feat"] * (
            1.0 - opacity
        )
    if "dino_pe" in results:
        out["dino_pe_free"] = out["dino_feat"]
        out["dino_pe"] = results["dino_pe"]
        out["dino_feat"] = out["dino_feat"] + results["dino_pe"]


def _row_searchsorted(sorted_rows, value):
    """searchsorted of a scalar into each row of (R, S); returns (R, 1)."""
    return jnp.sum(sorted_rows < value, axis=-1, keepdims=True)
