"""Scene contraction.

MERF-style piecewise-projective contraction with the infinity norm, matching
the reference (/root/reference/radiance_fields/nerf_utils.py:13-28):

  1. normalize world points into the aabb, mapping aabb -> [-1, 1]^3
  2. identity inside the unit ball (inf-norm), ``(2 - 1/|x|) * x/|x|`` outside
  3. affinely map [-2, 2] -> [0, 1]

Points whose contracted coords fall outside (0, 1) are zeroed by the caller
(see fields.py), matching radiance_field.py:294-300.
"""

import jax.numpy as jnp


def normalize_aabb(x, aabb):
    """Map world points into [0, 1] relative to an aabb [min3, max3]."""
    aabb_min, aabb_max = aabb[..., :3], aabb[..., 3:]
    return (x - aabb_min) / (aabb_max - aabb_min)


def contract_merf(x, aabb, ord=jnp.inf, eps=1e-12):
    """Contract unbounded points to [0, 1] (inf-norm piecewise projective)."""
    x = normalize_aabb(x, aabb) * 2.0 - 1.0  # aabb -> [-1, 1]
    if ord == jnp.inf:
        mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        mag = jnp.linalg.norm(x, ord=ord, axis=-1, keepdims=True)
    safe_mag = jnp.maximum(mag, eps)
    x = jnp.where(mag < 1.0, x, (2.0 - 1.0 / safe_mag) * (x / safe_mag))
    return x / 4.0 + 0.5  # (-inf, inf) -> (0, 1)


def inside_unit_cube_selector(normed, dtype=None):
    """1.0 where all coords strictly inside (0, 1); else 0.0
    (radiance_field.py:294-299)."""
    sel = jnp.all((normed > 0.0) & (normed < 1.0), axis=-1)
    return sel.astype(dtype or normed.dtype)
