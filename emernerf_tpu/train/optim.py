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


def _scale_by_adam_lp(b1=0.9, b2=0.99, eps=1e-15):
    """Adam direction with moments STORED in each param's own dtype but all
    update math in fp32.

    Hash tables are stored bfloat16 at the flagship scale (they are the
    memory budget: 2 x 540MB fp32 -> 270MB bf16, and Adam state triples
    that).  The reference precedent is the same: torch Adam state is
    created with ``zeros_like(param)`` and tcnn params are fp16, so the
    CUDA build trains fp16 moments (/root/reference/builders.py:50-61 +
    third_party/tcnn_modules.py fp16 params).  Computing the moment update
    in fp32 and rounding on store keeps the per-step rounding error
    unbiased instead of compounding inside bf16 arithmetic."""

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
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
