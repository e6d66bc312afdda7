"""Multi-chip data-parallel path (parallel/mesh.py) on the 8-virtual-device
CPU mesh provisioned by conftest.py.

The reference has no multi-device training at all (SURVEY.md §2.4); this is
the TPU-native capability the rebuild adds, so it gets first-class tests:
mesh construction, batch sharding layout, and one full sharded train step.
"""

import jax
import jax.numpy as jnp
import pytest

from emernerf_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_train_step,
)


@pytest.fixture(scope="module")
def tiny_setup():
    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship
    from emernerf_tpu.train.step import init_train_state

    cfg, dataset, model, prop_models, step_cfg = build_flagship(tiny=True)
    scene = dataset.scene_tensors()
    key = jax.random.PRNGKey(0)
    pixel_batch = sample_pixel_batch(
        scene, key, cfg.data.ray_batch_size, use_timestamps=True
    )
    lidar_batch = sample_lidar_batch(scene, key, cfg.data.ray_batch_size)
    state = init_train_state(model, prop_models, step_cfg, key, pixel_batch)

    # the train step donates its state buffers; hand each test a fresh copy
    def fresh_state():
        return jax.tree.map(jnp.copy, state)

    return cfg, model, prop_models, step_cfg, fresh_state, pixel_batch, lidar_batch


def test_make_mesh_uses_requested_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    mesh4 = make_mesh(4)
    assert mesh4.devices.size == 4


def test_batch_sharding_splits_leading_axis(tiny_setup):
    _, _, _, _, _, pixel_batch, _ = tiny_setup
    mesh = make_mesh(8)
    sharded = jax.device_put(pixel_batch, batch_sharding(mesh))
    origins = sharded["origins"]
    n = origins.shape[0]
    shards = origins.addressable_shards
    assert len(shards) == 8
    # every shard holds exactly 1/8 of the ray axis
    assert all(s.data.shape[0] == n // 8 for s in shards)


def test_sharded_train_step_runs_and_is_finite(tiny_setup):
    from emernerf_tpu.train.step import build_train_step

    cfg, model, prop_models, step_cfg, fresh_state, pixel_batch, lidar_batch = (
        tiny_setup
    )
    assert cfg.data.ray_batch_size % 8 == 0
    mesh = make_mesh(8)
    step_fn = shard_train_step(
        build_train_step(model, prop_models, step_cfg), mesh
    )
    state = fresh_state()
    step_before = int(state.step)
    new_state, metrics = step_fn(
        state, pixel_batch, lidar_batch, jax.random.PRNGKey(0),
        pixel_rg=True, lidar_rg=True,
    )
    jax.block_until_ready(new_state)
    assert int(new_state.step) == step_before + 1
    assert bool(jnp.isfinite(metrics["psnr"]))
    assert bool(jnp.isfinite(metrics["rgb_loss"]))
    # params stay replicated across the mesh after the update
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_eval_render_matches_single_device():
    """Eval chunk rendering sharded over the 8-device mesh (VERDICT #7) must
    bit-match the unsharded renderer: rays are embarrassingly parallel, so
    sharding the chunk's leading axis may not change any output."""
    import numpy as np

    from emernerf_tpu.eval.renderer import ImageRenderer
    from emernerf_tpu.models.fields import DensityField, RadianceField
    from emernerf_tpu.ops.hashgrid import HashGridSpec

    spec = HashGridSpec(3, 4, 4, 32, 8, 2)
    aabb = (-10.0, -10.0, -10.0, 10.0, 10.0, 10.0)
    model = RadianceField(
        static_spec=spec, aabb=aabb, geometry_feature_dim=8,
        base_mlp_layer_width=16, head_mlp_layer_width=16,
        semantic_feature_dim=0,
    )
    prop = DensityField(spec=spec, aabb=aabb, base_mlp_layer_width=16)
    r = 50  # not a multiple of the chunk size: exercises padding too
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(r, 3)).astype(np.float32)
    rays = {
        "origins": np.zeros((r, 3), np.float32),
        "viewdirs": dirs / np.linalg.norm(dirs, axis=-1, keepdims=True),
    }
    pos0 = jnp.zeros((r, 8, 3))
    params = model.init(
        jax.random.PRNGKey(0), pos0, jnp.ones((r, 8, 3)), {}
    )["params"]
    pp = (prop.init(jax.random.PRNGKey(1), pos0)["params"],)

    kw = dict(num_samples=8, prop_samples=(16,), chunk_size=32)
    single = ImageRenderer(model, [prop], **kw)
    sharded = ImageRenderer(model, [prop], mesh=make_mesh(8), **kw)
    out_single = single.render_rays_chunked(params, pp, rays)
    out_sharded = sharded.render_rays_chunked(params, pp, rays)
    np.testing.assert_allclose(
        out_sharded["rgb"], out_single["rgb"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        out_sharded["depth"], out_single["depth"], rtol=1e-5, atol=1e-5
    )

    # indivisible chunk_size is rejected up front
    with pytest.raises(ValueError):
        ImageRenderer(model, [prop], chunk_size=50, mesh=make_mesh(8))


@pytest.mark.slow
def test_sharded_step_matches_single_device(tiny_setup):
    """The sharded step must compute the same update as the unsharded one
    (the psum-of-means over shards equals the global mean)."""
    from emernerf_tpu.train.step import build_train_step

    cfg, model, prop_models, step_cfg, fresh_state, pixel_batch, lidar_batch = (
        tiny_setup
    )
    key = jax.random.PRNGKey(3)
    base_fn = build_train_step(model, prop_models, step_cfg)
    _, m_single = base_fn(
        fresh_state(), pixel_batch, lidar_batch, key,
        pixel_rg=True, lidar_rg=True,
    )
    mesh = make_mesh(8)
    step_fn = shard_train_step(base_fn, mesh)
    _, m_sharded = step_fn(
        fresh_state(), pixel_batch, lidar_batch, key,
        pixel_rg=True, lidar_rg=True,
    )
    assert jnp.allclose(
        m_single["rgb_loss"], m_sharded["rgb_loss"], rtol=1e-4, atol=1e-5
    )
