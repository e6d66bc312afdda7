"""Tests for volume rendering and the proposal sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from emernerf_tpu.models.fields import DensityField, RadianceField
from emernerf_tpu.ops.hashgrid import HashGridSpec
from emernerf_tpu.render.prop_sampler import (
    compute_prop_loss,
    proposal_requires_grad_schedule,
    sample_along_rays,
)
from emernerf_tpu.render.renderer import render_ray_batch
from emernerf_tpu.render.volrend import composite_rays

TINY3 = HashGridSpec(
    n_input_dims=3, n_levels=4, base_resolution=4, max_resolution=32,
    log2_hashmap_size=8, n_features_per_level=2,
)
AABB = (-10.0, -10.0, -10.0, 10.0, 10.0, 10.0)


# --------------------------------------------------------------------------
# compositor
# --------------------------------------------------------------------------
def test_composite_opaque_sample():
    """A single very dense sample renders its own color and depth."""
    t_starts = jnp.asarray([[1.0, 2.0, 3.0]])
    t_ends = jnp.asarray([[2.0, 3.0, 4.0]])
    density = jnp.asarray([[0.0, 1000.0, 0.0]])
    rgb = jnp.asarray([[[1.0, 0.0, 0.0], [0.2, 0.4, 0.6], [0.0, 0.0, 1.0]]])
    out = composite_rays(t_starts, t_ends, {"density": density, "rgb": rgb})
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), [0.2, 0.4, 0.6], atol=1e-4)
    np.testing.assert_allclose(float(out["depth"][0, 0]), 2.5, atol=1e-3)
    np.testing.assert_allclose(float(out["median_depth"][0, 0]), 2.5, atol=1e-3)
    np.testing.assert_allclose(float(out["opacity"][0, 0]), 1.0, atol=1e-4)


def test_composite_sky_fills_empty_rays():
    t_starts = jnp.asarray([[1.0, 2.0]])
    t_ends = jnp.asarray([[2.0, 3.0]])
    density = jnp.zeros((1, 2))
    rgb = jnp.zeros((1, 2, 3))
    sky = jnp.asarray([[0.3, 0.5, 0.7]])
    out = composite_rays(
        t_starts, t_ends, {"density": density, "rgb": rgb, "rgb_sky": sky}
    )
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), [0.3, 0.5, 0.7], atol=1e-4)


def test_composite_static_dynamic_decomposition():
    t_starts = jnp.asarray([[1.0, 2.0]])
    t_ends = jnp.asarray([[2.0, 3.0]])
    sd = jnp.asarray([[5.0, 0.1]])
    dd = jnp.asarray([[0.1, 5.0]])
    res = {
        "density": sd + dd,
        "static_density": sd,
        "dynamic_density": dd,
        "static_rgb": jnp.ones((1, 2, 3)),
        "dynamic_rgb": jnp.zeros((1, 2, 3)),
    }
    out = composite_rays(t_starts, t_ends, res, return_decomposition=True)
    for k in ("static_opacity", "dynamic_opacity", "static_rgb", "dynamic_rgb",
              "static_depth", "dynamic_depth"):
        assert k in out, k
    # the mostly-static first sample dominates the blend
    assert float(out["rgb"][0, 0]) > 0.5


# --------------------------------------------------------------------------
# proposal sampler
# --------------------------------------------------------------------------
def _const_density_fn(value):
    def fn(t_starts, t_ends):
        return jnp.full(t_starts.shape, value)

    return fn


def test_sample_along_rays_shapes_and_bounds():
    key = jax.random.PRNGKey(0)
    t_starts, t_ends, s_vals, caches = sample_along_rays(
        key, [_const_density_fn(0.01), _const_density_fn(0.01)], [16, 8], 8,
        n_rays=4, near_plane=0.1, far_plane=1000.0, stratified=True,
        requires_grad=True,
    )
    assert t_starts.shape == (4, 8) and t_ends.shape == (4, 8)
    assert s_vals.shape == (4, 9)
    assert len(caches) == 2
    assert caches[0].s_vals.shape == (4, 17)
    assert bool(jnp.all(t_starts >= 0.1 - 1e-5))
    assert bool(jnp.all(t_ends <= 1000.0 + 1e-3))
    assert bool(jnp.all(t_ends > t_starts))


def test_prop_loss_zero_without_cache():
    loss = compute_prop_loss([], jnp.zeros((4, 9)), jnp.ones((4, 8)))
    assert float(loss) == 0.0


def test_prop_loss_grads_reach_propnet():
    """Gradients of the interlevel loss must flow into proposal densities."""
    key = jax.random.PRNGKey(0)

    def loss_of_bias(bias):
        def fn(t_starts, t_ends):
            return jnp.full(t_starts.shape, 0.01) + bias

        t_starts, t_ends, s_vals, caches = sample_along_rays(
            key, [fn], [16], 8, n_rays=4, near_plane=0.1, far_plane=100.0,
            requires_grad=True,
        )
        trans = jnp.exp(-jnp.cumsum(jnp.ones_like(t_starts) * 0.05, -1))
        return compute_prop_loss(caches, s_vals, trans)

    g = jax.grad(loss_of_bias)(0.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_proposal_requires_grad_schedule():
    fn = proposal_requires_grad_schedule(target=5.0, num_steps=1000)
    # reference semantics: very first call is False (counter starts at 0),
    # then every early call requires grad
    flags = [fn(0), fn(0), fn(1), fn(1)]
    assert flags == [False, True, True, True]
    # late steps: sparse
    fn2 = proposal_requires_grad_schedule(target=5.0, num_steps=1000)
    late = [fn2(5000) for _ in range(12)]
    assert 1 <= sum(late) <= 3


# --------------------------------------------------------------------------
# end-to-end ray batch
# --------------------------------------------------------------------------
def test_render_ray_batch_end_to_end():
    model = RadianceField(
        static_spec=TINY3, aabb=AABB, geometry_feature_dim=8,
        base_mlp_layer_width=16, head_mlp_layer_width=16,
        semantic_feature_dim=0, enable_img_embedding=True,
        num_train_timesteps=2, num_cams=1, appearance_embedding_dim=4,
        enable_sky_head=True,
    )
    prop = DensityField(spec=TINY3, aabb=AABB, base_mlp_layer_width=16)

    r = 16
    rays = {
        "origins": jnp.zeros((r, 3)),
        "viewdirs": jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (r, 1)),
        "img_idx": jnp.zeros((r,), jnp.int32),
    }
    pos0 = jnp.zeros((r, 8, 3))
    dirs0 = jnp.ones((r, 8, 3))
    params = model.init(
        jax.random.PRNGKey(0), pos0, dirs0,
        {"img_idx": jnp.zeros((r, 8), jnp.int32)},
    )["params"]
    prop_params = prop.init(jax.random.PRNGKey(1), pos0)["params"]

    out, caches, s_vals = render_ray_batch(
        model, params, [prop], [prop_params], rays, jax.random.PRNGKey(2),
        num_samples=8, prop_samples=(16,), stratified=True,
        proposal_requires_grad=True, train=False,
    )
    assert out["rgb"].shape == (r, 3)
    assert out["depth"].shape == (r, 1)
    assert out["extras"]["weights"].shape == (r, 8)
    assert len(caches) == 1
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
