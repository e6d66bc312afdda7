"""Optimizer and learning-rate schedule matching the reference.

The reference uses torch Adam(lr, eps=1e-15, weight_decay, betas=(0.9, 0.99))
(/root/reference/builders.py:50-61) under a ChainedScheduler of LinearLR
warmup (start_factor 0.01, total num_iters//10) and MultiStepLR (gamma 0.33
at [num_iters//4 (if >=10k), //2, 3//4, 9//10]) (builders.py:64-89).

A subtlety reproduced on purpose: the torch scheduler is stepped after BOTH
the pixel and the lidar optimizer step, i.e. twice per training iteration
when lidar supervision is on (train_emernerf.py:745,826).  The schedule here
is therefore a function of the *scheduler call count*, which the train step
derives from the iteration index.

torch Adam's weight decay is L2-added-to-grad (not decoupled), which is
``optax.add_decayed_weights`` placed BEFORE ``scale_by_adam``.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import optax


# params with more elements than this store Adam moments in bf16 (the two
# flagship hash tables are ~160M elements each; every MLP/head/embedding is
# <100k and keeps fp32 moments)
_BF16_MOMENT_MIN_ELEMS = 1 << 20


def _scale_by_adam_lp(b1=0.9, b2=0.99, eps=1e-15):
    """Adam direction with fp32 update math and reduced-precision moment
    STORAGE for the huge hash tables.

    Master params are fp32 (model default ``table_param_dtype=float32``):
    after the lr schedule decays (0.33^4 ~ 1e-4 x base_lr) per-step updates
    fall below the bf16 ulp of typical param magnitudes, so bf16 param
    storage silently drops them and table training stalls late in the run
    (round-1 ADVICE.md).  Moments of the big tables are stored bf16 — they
    are EMAs updated multiplicatively (b*m + (1-b)*g computed in fp32,
    rounded on store), which has no such additive-cancellation cliff, and
    they are the HBM bulk (2 moments x 2 tables x ~640MB fp32).  The
    reference precedent is fp16 tcnn params with param-dtype torch Adam
    state (/root/reference/builders.py:50-61)."""

    def _moment_like(p):
        if p.dtype == jnp.float32 and p.size >= _BF16_MOMENT_MIN_ELEMS:
            return jnp.zeros(p.shape, jnp.bfloat16)
        return jnp.zeros_like(p)

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(_moment_like, params),
            nu=jax.tree.map(_moment_like, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def new_mu(g, mu):
            return (
                b1 * mu.astype(jnp.float32)
                + (1.0 - b1) * g.astype(jnp.float32)
            ).astype(mu.dtype)

        def new_nu(g, nu):
            g32 = g.astype(jnp.float32)
            return (
                b2 * nu.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            ).astype(nu.dtype)

        def direction(mu, nu):
            mu32, nu32 = mu.astype(jnp.float32), nu.astype(jnp.float32)
            return (mu32 / c1) / (jnp.sqrt(nu32 / c2) + eps)

        mu = jax.tree.map(new_mu, updates, state.mu)
        nu = jax.tree.map(new_nu, updates, state.nu)
        direction = jax.tree.map(direction, mu, nu)
        return direction, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_adam(weight_decay: float = 1e-5) -> optax.GradientTransformation:
    """Adam direction (lr applied separately by the train step so the two
    updates per iteration can use different scheduler counts).

    Moments are stored in each param's dtype (fp32 for MLPs/embeddings,
    bf16 for bf16 hash tables) with fp32 update math — see
    ``_scale_by_adam_lp``."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        _scale_by_adam_lp(b1=0.9, b2=0.99, eps=1e-15),
    )


def chained_lr_schedule(base_lr: float, num_iters: int):
    """lr as a function of the scheduler call count (jit-traceable)."""
    milestones: List[int] = [
        num_iters // 2,
        num_iters * 3 // 4,
        num_iters * 9 // 10,
    ]
    if num_iters >= 10000:
        milestones.insert(0, num_iters // 4)
    warmup = max(num_iters // 10, 1)

    def lr(count):
        count = jnp.asarray(count, jnp.float32)
        warm = 0.01 + 0.99 * jnp.minimum(count, warmup) / warmup
        n_hit = sum((count >= m).astype(jnp.float32) for m in milestones)
        return base_lr * warm * (0.33**n_hit)

    return lr


def apply_update(tx, grads, opt_state, params, lr):
    """One optimizer step: adam direction scaled by -lr."""
    updates, new_opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u: -lr * u, updates)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state
