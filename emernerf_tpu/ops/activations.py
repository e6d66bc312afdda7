"""Density activations.

``trunc_exp`` reproduces the truncated-exponential activation the reference
uses for all densities (/root/reference/radiance_fields/nerf_utils.py:59-75):
forward is ``exp(x)``; backward clamps the saved input at 15 so the gradient
``g * exp(min(x, 15))`` cannot blow up.  Implemented as a ``jax.custom_vjp``
instead of a torch autograd.Function.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def density_activation(x):
    """The reference's density head activation: ``trunc_exp(x - 1)``
    (/root/reference/radiance_fields/radiance_field.py:28)."""
    return trunc_exp(x - 1.0)
