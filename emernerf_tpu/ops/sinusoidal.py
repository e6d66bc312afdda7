"""NeRF sinusoidal positional encoding.

Matches the reference SinusoidalEncoder
(/root/reference/radiance_fields/encodings.py:60-104): frequencies
``2^min_deg .. 2^max_deg``, encoded as ``sin(xb)`` then ``sin(xb + pi/2)``
(= cos), with the identity optionally prepended.  Output layout is
``[x, sin(x*2^m..), cos(x*2^m..)]`` with frequencies fastest over input dims.
"""

import jax.numpy as jnp


def sinusoidal_output_dim(n_input_dims, min_deg=0, max_deg=4, enable_identity=True):
    return (int(enable_identity) + (max_deg - min_deg + 1) * 2) * n_input_dims


def sinusoidal_encode(x, min_deg=0, max_deg=4, enable_identity=True):
    """x: (..., D) -> (..., sinusoidal_output_dim)."""
    if max_deg == min_deg:
        return x
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg + 1)], dtype=x.dtype)
    # (..., n_freq, D) -> (..., n_freq * D); frequency-major like the reference
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    encoded = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    if enable_identity:
        encoded = jnp.concatenate([x, encoded], axis=-1)
    return encoded
