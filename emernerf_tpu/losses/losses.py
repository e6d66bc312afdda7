"""EmerNeRF training losses as pure functions returning scalars.

Functional equivalents of /root/reference/loss/base.py.  Masked means are
computed as sum(loss*mask)/sum(mask) so shapes stay static under jit (the
reference boolean-indexes, which would be a dynamic shape).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _elementwise(pred, gt, loss_type: str):
    diff = pred - gt
    if loss_type == "l2":
        return diff**2
    if loss_type == "l1":
        return jnp.abs(diff)
    if loss_type == "smooth_l1":  # torch default beta=1.0
        ad = jnp.abs(diff)
        return jnp.where(ad < 1.0, 0.5 * diff**2, ad - 0.5)
    raise NotImplementedError(loss_type)


def real_value_loss(pred, gt, loss_type="l2", coef=1.0, mask=None):
    """RGB / feature loss (loss/base.py:83-146)."""
    loss = _elementwise(pred, gt, loss_type)
    if mask is not None:
        loss = loss * mask
    return loss.mean() * coef


def sky_loss_weights(weights, sky_mask, coef=0.01):
    """Penalize sample weights on sky rays (loss/base.py:167-169)."""
    return (jnp.square(weights).sum(-1) * sky_mask).mean() * coef


def sky_loss_opacity(opacity, sky_mask, coef=0.001, eps=1e-6):
    """BCE(opacity, 1 - sky_mask) (loss/base.py:171-175)."""
    o = jnp.clip(jnp.squeeze(opacity, -1), eps, 1.0 - eps)
    target = 1.0 - sky_mask.astype(o.dtype)
    bce = -(target * jnp.log(o) + (1.0 - target) * jnp.log(1.0 - o))
    return bce.mean() * coef


def normalize_depth(depth, max_depth=80.0):
    return jnp.clip(depth / max_depth, 0.0, 1.0)


def depth_loss(pred_depth, gt_depth, loss_type="l2", coef=1.0, max_depth=80.0):
    """Normalized depth loss over valid lidar returns (loss/base.py:232-249);
    mean is over valid rays only (0.01 < gt < max_depth)."""
    pred = jnp.reshape(pred_depth, (-1,))
    gt = jnp.reshape(gt_depth, (-1,))
    valid = ((gt > 0.01) & (gt < max_depth)).astype(pred.dtype)
    err = _elementwise(
        normalize_depth(pred, max_depth), normalize_depth(gt, max_depth), loss_type
    )
    return (err * valid).sum() / jnp.maximum(valid.sum(), 1.0) * coef


def dirac_delta_approx(x, mu=0.0, sigma=1e-5):
    # sigma may be a traced scalar (the epsilon decay schedule)
    sigma = jnp.asarray(sigma)
    return (1.0 / jnp.sqrt(2.0 * math.pi * sigma**2)) * jnp.exp(
        -((x - mu) ** 2) / (2.0 * sigma**2)
    )


def line_of_sight_loss(
    gt_depth, weights, t_vals, epsilon, coef=0.1, coef_decay=1.0
):
    """Line-of-sight loss (loss/base.py:430-464): push weights to zero in
    free space before the lidar return and toward a narrow Gaussian around
    it.  Faithful to the reference, including its scalar-mean-then-mask
    structure: empty/near terms are global means scaled by the fraction of
    rays with a valid return."""
    gt = jnp.reshape(gt_depth, (-1,))[:, None]  # (R, 1)
    t_vals = jax.lax.stop_gradient(t_vals)
    depth_mask = (gt[:, 0] > 0.0).astype(weights.dtype)

    empty_mask = (t_vals < gt - epsilon).astype(weights.dtype)
    near_mask = ((t_vals > gt - epsilon) & (t_vals < gt + epsilon)).astype(
        weights.dtype
    )
    empty_loss = (jnp.square(weights) * empty_mask).sum(-1).mean()
    near_loss = (
        (
            jnp.square(weights - dirac_delta_approx(t_vals - gt, sigma=epsilon / 3.0))
            * near_mask
        )
        .sum(-1)
        .mean()
    )
    sight = (empty_loss + near_loss) * depth_mask
    return sight.mean() * coef * coef_decay


def dynamic_regularization_loss(
    dynamic_density,
    static_density=None,
    mask=None,
    loss_type="sparsity",
    coef=0.01,
    entropy_skewness=2.0,
):
    """Dynamic-density regularization (loss/base.py:338-410)."""
    if loss_type == "sparsity":
        loss = dynamic_density
        if mask is not None:
            loss = loss + 2.0 * dynamic_density * mask[..., None]
    elif loss_type == "entropy":
        ratio = dynamic_density / (dynamic_density + static_density + 1e-7)
        skewed = jnp.clip(ratio**entropy_skewness, 1e-6, 1.0 - 1e-6)
        loss = -(skewed * jnp.log(skewed)) - (1.0 - skewed) * jnp.log(1.0 - skewed)
    else:
        raise NotImplementedError(loss_type)
    return loss.mean() * coef


def cycle_consistency_loss(
    forward_flow, forward_pred_backward_flow,
    backward_flow, backward_pred_forward_flow, coef=0.01, mask=None,
):
    """Inline cycle loss of the train loop
    (/root/reference/train_emernerf.py:700-716): warped-point flow should
    invert the original flow.  ``mask`` (from top-K temporal aggregation,
    models/fields.py) restricts the mean to samples whose warped cycle
    predictions were actually computed."""
    per = 0.5 * (
        (jax.lax.stop_gradient(forward_flow) + forward_pred_backward_flow) ** 2
        + (jax.lax.stop_gradient(backward_flow) + backward_pred_forward_flow) ** 2
    )
    if mask is not None:
        m = mask[..., None]
        loss = (per * m).sum() / jnp.maximum(m.sum() * per.shape[-1], 1.0)
    else:
        loss = per.mean()
    return loss * coef
