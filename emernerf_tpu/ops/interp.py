"""Bilinear sampling matching torch.nn.functional.grid_sample semantics
(mode='bilinear', align_corners=False, padding_mode='zeros').

Used for the learnable positional-embedding map lookup
(/root/reference/radiance_fields/radiance_field.py:509-521).
"""

import jax.numpy as jnp


def grid_sample_2d(image_hwc, gx, gy):
    """Sample image (H, W, C) at normalized coords gx (width axis), gy
    (height axis) in [-1, 1], align_corners=False, zero padding.

    gx, gy: (N,) -> returns (N, C).
    """
    h, w, _ = image_hwc.shape
    ix = ((gx + 1.0) * w - 1.0) / 2.0
    iy = ((gy + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = image_hwc[yi_c, xi_c]
        return vals * valid[..., None].astype(image_hwc.dtype)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    fx = fx[..., None].astype(image_hwc.dtype)
    fy = fy[..., None].astype(image_hwc.dtype)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
