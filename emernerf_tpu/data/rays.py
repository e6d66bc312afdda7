"""Camera ray generation.

Matches the reference ``get_rays``
(/root/reference/datasets/base/pixel_source.py:39-76): OpenCV-convention
intrinsics with the +0.5 pixel-center offset, directions rotated by the c2w
rotation, normalized with the pre-normalization norm returned separately
(used to convert z-depth supervision).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_rays(x, y, c2w, intrinsic):
    """
    Args:
        x, y: pixel coords, shape (N,) (x horizontal, y vertical).
        c2w: (N, 4, 4) camera-to-world matrices.
        intrinsic: (N, 3, 3) intrinsics.
    Returns:
        origins (N, 3), viewdirs (N, 3), direction_norm (N, 1)
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    camera_dirs = jnp.stack(
        [
            (x - intrinsic[:, 0, 2] + 0.5) / intrinsic[:, 0, 0],
            (y - intrinsic[:, 1, 2] + 0.5) / intrinsic[:, 1, 1],
            jnp.ones_like(x),
        ],
        axis=-1,
    )  # (N, 3)
    directions = (camera_dirs[:, None, :] * c2w[:, :3, :3]).sum(axis=-1)
    origins = jnp.broadcast_to(c2w[:, :3, -1], directions.shape)
    direction_norm = jnp.linalg.norm(directions, axis=-1, keepdims=True)
    viewdirs = directions / (direction_norm + 1e-8)
    return origins, viewdirs, direction_norm
