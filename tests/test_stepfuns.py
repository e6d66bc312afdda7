"""Tests for sampling / step-function math (ops/stepfuns.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from emernerf_tpu.ops.stepfuns import (
    accumulate_along_rays,
    blur_stepfun,
    exclusive_cumsum,
    importance_sampling,
    pdf_outer_loss,
    render_transmittance_from_density,
    sorted_interp_quad,
    transform_stot,
)


def test_exclusive_cumsum():
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(exclusive_cumsum(x), [[0.0, 1.0, 3.0]])


def test_transform_stot_uniform_lindisp_endpoints():
    s = jnp.asarray([[0.0, 0.5, 1.0]])
    t = transform_stot("uniform_lindisp", s, 0.1, 1000.0)
    # endpoints must map to near/far
    np.testing.assert_allclose(t[0, 0], 0.1, rtol=1e-4)
    np.testing.assert_allclose(t[0, -1], 1000.0, rtol=1e-4)
    assert 0.1 < float(t[0, 1]) < 1000.0


def test_transform_stot_piecewise_boundary():
    """The reference warp is linear below 200m: t(s) = 400*s*smax'... check
    continuity at the 200m knee."""
    s_lo = jnp.asarray([[0.499999]])
    s_hi = jnp.asarray([[0.500001]])
    t_lo = transform_stot("uniform_lindisp", s_lo, 0.0, 1000.0)
    # near=0 -> s_min=0, s_max = 1 - 1/(2*1000/200) = 0.9
    t_hi = transform_stot("uniform_lindisp", s_hi, 0.0, 1000.0)
    assert abs(float(t_hi[0, 0]) - float(t_lo[0, 0])) < 0.01


def test_transmittance_matches_bruteforce():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0.1, 10, (4, 9)), axis=-1).astype(np.float32)
    t_starts, t_ends = t[:, :-1], t[:, 1:]
    sigmas = rng.uniform(0, 2, t_starts.shape).astype(np.float32)
    trans, alphas = render_transmittance_from_density(
        jnp.asarray(t_starts), jnp.asarray(t_ends), jnp.asarray(sigmas)
    )
    sdt = sigmas * (t_ends - t_starts)
    want_trans = np.exp(-np.concatenate(
        [np.zeros((4, 1)), np.cumsum(sdt, -1)[:, :-1]], -1))
    np.testing.assert_allclose(np.asarray(trans), want_trans, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(alphas), 1 - np.exp(-sdt), rtol=1e-5)
    # weights sum <= 1
    assert np.all(np.asarray(trans * alphas).sum(-1) <= 1.0 + 1e-5)


def test_importance_sampling_uniform_cdf():
    """A flat CDF must produce (nearly) evenly spaced samples."""
    s_vals = jnp.asarray([[0.0, 1.0]])
    cdfs = jnp.asarray([[0.0, 1.0]])
    out = importance_sampling(s_vals, cdfs, 8, stratified=False)
    d = np.diff(np.asarray(out[0]))
    np.testing.assert_allclose(d, d[0], rtol=1e-5)
    assert out.shape == (1, 9)


def test_importance_sampling_concentrates():
    """Mass concentrated in [0.4, 0.6] must pull samples there."""
    edges = jnp.linspace(0, 1, 11)[None]
    cdf = jnp.asarray(
        [[0, 0.01, 0.02, 0.03, 0.04, 0.5, 0.96, 0.97, 0.98, 0.99, 1.0]]
    )
    out = importance_sampling(edges, cdf, 16, stratified=False)
    frac_inside = np.mean((np.asarray(out) > 0.38) & (np.asarray(out) < 0.62))
    assert frac_inside > 0.7


def test_importance_sampling_stratified_reproducible_and_sorted():
    key = jax.random.PRNGKey(3)
    edges = jnp.linspace(0, 1, 5)[None].repeat(4, 0)
    cdf = jnp.asarray([0.0, 0.2, 0.5, 0.9, 1.0])[None].repeat(4, 0)
    out = importance_sampling(edges, cdf, 8, stratified=True, key=key)
    arr = np.asarray(out)
    assert np.all(np.diff(arr, axis=-1) >= -1e-6)
    out2 = importance_sampling(edges, cdf, 8, stratified=True, key=key)
    np.testing.assert_array_equal(arr, np.asarray(out2))


def _blur_stepfun_oracle(x, y, r):
    """Direct numpy port of the reference blur_stepfun
    (nerfacc_prop_net.py:22-34) used as a golden oracle."""
    xr_cat = np.concatenate([x - r, x + r], axis=-1)
    xr_idx = np.argsort(xr_cat, axis=-1)
    xr = np.take_along_axis(xr_cat, xr_idx, axis=-1)
    zeros = np.zeros_like(y[..., :1])
    y1 = (np.concatenate([y, zeros], -1) - np.concatenate([zeros, y], -1)) / (2 * r)
    y2 = np.take_along_axis(
        np.concatenate([y1, -y1], -1), xr_idx[..., :-1], axis=-1
    )
    yr = np.clip(
        np.cumsum((xr[..., 1:] - xr[..., :-1]) * np.cumsum(y2, -1), -1), 0, None
    )
    return xr, np.concatenate([np.zeros_like(yr[..., :1]), yr], -1)


def test_blur_stepfun_matches_oracle():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 1, (3, 9)), -1).astype(np.float64)
    y = rng.uniform(0, 2, (3, 8)).astype(np.float64)
    for r in (0.03, 0.003):
        xr, yr = blur_stepfun(jnp.asarray(x), jnp.asarray(y), r)
        xo, yo = _blur_stepfun_oracle(x, y, r)
        np.testing.assert_allclose(np.asarray(xr), xo, atol=1e-6)
        np.testing.assert_allclose(np.asarray(yr), yo, atol=1e-5)


def test_blur_stepfun_preserves_mass():
    """Box blur preserves the integral of the step function."""
    x = jnp.asarray([[0.0, 0.2, 0.5, 1.0]])
    y = jnp.asarray([[1.0, 3.0, 0.5]])
    mass = float((y * (x[..., 1:] - x[..., :-1])).sum())
    xr, yr = blur_stepfun(x, y, 0.01)
    blurred_mass = float(
        (0.5 * (yr[..., 1:] + yr[..., :-1]) * (xr[..., 1:] - xr[..., :-1])).sum()
    )
    assert abs(blurred_mass - mass) < 1e-4


def test_sorted_interp_quad_recovers_linear_cdf():
    """For a piecewise-constant pdf, the quadratic interp at the knots must
    reproduce the cdf values."""
    xp = jnp.asarray([[0.0, 0.25, 0.5, 0.75, 1.0]])
    fpdf = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 1.0]])
    fcdf = jnp.asarray([[0.0, 0.25, 0.5, 0.75, 1.0]])
    x = jnp.asarray([[0.1, 0.3, 0.6, 0.9]])
    out = sorted_interp_quad(x, xp, fpdf, fcdf)
    np.testing.assert_allclose(np.asarray(out), [[0.1, 0.3, 0.6, 0.9]], atol=1e-6)


def test_pdf_outer_loss_zero_when_matching():
    """If the proposal reproduces the final distribution, the outer loss is 0
    (the envelope bound is satisfied)."""
    s = jnp.asarray([[0.0, 0.25, 0.5, 0.75, 1.0]])
    cdf = jnp.asarray([[0.0, 0.25, 0.5, 0.75, 1.0]])
    loss = pdf_outer_loss(s, cdf, s, cdf)
    assert float(loss.mean()) < 1e-10


def test_accumulate_along_rays():
    w = jnp.asarray([[0.5, 0.25]])
    v = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
    np.testing.assert_allclose(accumulate_along_rays(w), [[0.75]])
    np.testing.assert_allclose(accumulate_along_rays(w, v), [[1.25, 2.0]])
