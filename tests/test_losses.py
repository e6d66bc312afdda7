"""Hand-computed checks for the loss library."""

import jax.numpy as jnp
import numpy as np

from emernerf_tpu.losses.losses import (
    cycle_consistency_loss,
    depth_loss,
    dynamic_regularization_loss,
    line_of_sight_loss,
    real_value_loss,
    sky_loss_opacity,
    sky_loss_weights,
)


def test_real_value_losses():
    pred = jnp.asarray([1.0, 2.0])
    gt = jnp.asarray([0.0, 4.0])
    assert np.isclose(float(real_value_loss(pred, gt, "l2")), (1 + 4) / 2)
    assert np.isclose(float(real_value_loss(pred, gt, "l1")), (1 + 2) / 2)
    # smooth_l1 (beta=1): 0.5*1^2 and 2-0.5
    assert np.isclose(float(real_value_loss(pred, gt, "smooth_l1")), (0.5 + 1.5) / 2)
    assert np.isclose(float(real_value_loss(pred, gt, "l2", coef=0.5)), 1.25)


def test_sky_losses():
    opacity = jnp.asarray([[0.9], [0.1]])
    sky = jnp.asarray([0.0, 1.0])  # ray 0 not sky, ray 1 sky
    good = float(sky_loss_opacity(opacity, sky, coef=1.0))
    bad = float(sky_loss_opacity(1.0 - opacity, sky, coef=1.0))
    assert good < bad

    weights = jnp.asarray([[0.5, 0.5], [0.3, 0.3]])
    wl = float(sky_loss_weights(weights, sky, coef=1.0))
    assert np.isclose(wl, (0.18) / 2)


def test_depth_loss_masks_invalid():
    pred = jnp.asarray([10.0, 10.0, 10.0])
    gt = jnp.asarray([20.0, 0.0, 100.0])  # last two invalid (0 and >80)
    val = float(depth_loss(pred, gt, "l2", coef=1.0, max_depth=80.0))
    assert np.isclose(val, ((10 / 80) - (20 / 80)) ** 2, rtol=1e-5)


def test_line_of_sight_loss_prefers_correct_depth():
    t_vals = jnp.linspace(1.0, 30.0, 32)[None].repeat(4, 0)
    gt = jnp.full((4,), 15.0)
    # weights peaked at the right bin
    peak = jnp.argmin(jnp.abs(t_vals[0] - 15.0))
    w_good = jnp.zeros((4, 32)).at[:, peak].set(1.0)
    w_bad = jnp.zeros((4, 32)).at[:, 2].set(1.0)
    good = float(line_of_sight_loss(gt, w_good, t_vals, epsilon=3.0, coef=1.0))
    bad = float(line_of_sight_loss(gt, w_bad, t_vals, epsilon=3.0, coef=1.0))
    assert good < bad


def test_dynamic_regularization():
    dd = jnp.asarray([[1.0, 3.0]])
    assert np.isclose(
        float(dynamic_regularization_loss(dd, loss_type="sparsity", coef=1.0)), 2.0
    )
    sd = jnp.asarray([[1.0, 3.0]])
    ent = float(
        dynamic_regularization_loss(
            dd, sd, loss_type="entropy", coef=1.0, entropy_skewness=2.0
        )
    )
    assert ent > 0


def test_cycle_loss_zero_when_inverse():
    fwd = jnp.ones((4, 8, 3))
    assert np.isclose(
        float(cycle_consistency_loss(fwd, -fwd, -fwd, fwd, coef=1.0)), 0.0
    )
    assert float(cycle_consistency_loss(fwd, fwd, -fwd, -fwd, coef=1.0)) > 0
