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


def make_adam(weight_decay: float = 1e-5) -> optax.GradientTransformation:
    """Adam direction (lr applied separately by the train step so the two
    updates per iteration can use different scheduler counts).

    ``mu_dtype=float32`` keeps the first moment in fp32 even for bfloat16
    tables (SURVEY §2.3: bf16 params + fp32 optimizer state; the second
    moment is fp32 by optax default via the squared-grad accumulation)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(
            b1=0.9, b2=0.99, eps=1e-15, eps_root=0.0, mu_dtype=jnp.float32
        ),
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
