"""Tests for the radiance / density fields (models/fields.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emernerf_tpu.models.fields import DensityField, RadianceField
from emernerf_tpu.ops.hashgrid import HashGridSpec

TINY3 = HashGridSpec(
    n_input_dims=3, n_levels=4, base_resolution=4, max_resolution=32,
    log2_hashmap_size=8, n_features_per_level=2,
)
TINY4 = HashGridSpec(
    n_input_dims=4, n_levels=4, base_resolution=4, max_resolution=32,
    log2_hashmap_size=8, n_features_per_level=2,
)
AABB = (-10.0, -10.0, -10.0, 10.0, 10.0, 10.0)


def _mk_static(**kw):
    defaults = dict(
        static_spec=TINY3, aabb=AABB, geometry_feature_dim=8,
        base_mlp_layer_width=16, head_mlp_layer_width=16,
        semantic_feature_dim=0, enable_img_embedding=True,
        num_train_timesteps=4, num_cams=1, appearance_embedding_dim=4,
    )
    defaults.update(kw)
    return RadianceField(**defaults)


def test_density_field_shapes_and_positivity():
    model = DensityField(spec=TINY3, aabb=AABB, base_mlp_layer_width=16)
    pos = jax.random.normal(jax.random.PRNGKey(1), (8, 5, 3)) * 5
    params = model.init(jax.random.PRNGKey(0), pos)["params"]
    density = model.apply({"params": params}, pos)
    assert density.shape == (8, 5)
    assert bool(jnp.all(density > 0))


def test_static_radiance_field_forward():
    model = _mk_static(enable_sky_head=True)
    pos = jax.random.normal(jax.random.PRNGKey(1), (8, 5, 3)) * 5
    dirs_raw = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    dirs = dirs_raw / jnp.linalg.norm(dirs_raw, axis=-1, keepdims=True)
    dirs = jnp.broadcast_to(dirs[:, None, :], pos.shape)
    data = {"img_idx": jnp.zeros((8, 5), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), pos, dirs, data)["params"]
    out = model.apply({"params": params}, pos, dirs, data)
    assert out["density"].shape == (8, 5)
    assert out["rgb"].shape == (8, 5, 3)
    assert out["rgb_sky"].shape == (8, 3)
    assert bool(jnp.all((out["rgb"] >= 0) & (out["rgb"] <= 1)))


def test_density_only_skips_heads():
    model = _mk_static()
    pos = jnp.zeros((4, 3, 3))
    dirs = jnp.ones((4, 3, 3))
    params = model.init(jax.random.PRNGKey(0), pos, dirs, {})["params"]
    out = model.apply({"params": params}, pos, dirs, {}, return_density_only=True)
    assert "rgb" not in out and "density" in out


def test_dynamic_field_blends_densities():
    model = _mk_static(dynamic_spec=TINY4)
    pos = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 3))
    dirs = jnp.ones((4, 3, 3)) / jnp.sqrt(3.0)
    data = {
        "normed_timestamps": jnp.full((4, 3), 0.5),
        "img_idx": jnp.zeros((4, 3), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), pos, dirs, data)["params"]
    out = model.apply({"params": params}, pos, dirs, data)
    np.testing.assert_allclose(
        np.asarray(out["density"]),
        np.asarray(out["static_density"] + out["dynamic_density"]),
        rtol=1e-5,
    )
    assert out["static_rgb"].shape == (4, 3, 3)
    assert out["dynamic_rgb"].shape == (4, 3, 3)


def test_flow_field_temporal_aggregation():
    model = _mk_static(dynamic_spec=TINY4, flow_spec=TINY4, time_diff=0.1)
    pos = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 3))
    dirs = jnp.ones((4, 3, 3)) / jnp.sqrt(3.0)
    data = {
        "normed_timestamps": jnp.full((4, 3), 0.5),
        "img_idx": jnp.zeros((4, 3), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), pos, dirs, data)["params"]
    out = model.apply(
        {"params": params}, pos, dirs, data, train=True,
        rngs={"aggregation": jax.random.PRNGKey(7)},
    )
    for k in (
        "forward_flow", "backward_flow",
        "forward_pred_backward_flow", "backward_pred_forward_flow",
    ):
        assert out[k].shape == (4, 3, 3), k
    # eval path needs no rng
    out_eval = model.apply({"params": params}, pos, dirs, data, train=False)
    assert out_eval["density"].shape == (4, 3)


@pytest.mark.slow
def test_fused_dynflow_grid_matches_interfaces():
    """fuse_flow_grid=True stores dynamic + flow in ONE table; the model
    must expose the exact same output surface, produce finite grads into
    the fused table, and query_flow/query_attributes must keep working."""
    from emernerf_tpu.ops.brickgrid import BrickGridSpec

    b4 = BrickGridSpec(4, 4, 4, 32, 7, 2, time_pair=True)
    b3 = BrickGridSpec(3, 4, 4, 32, 8, 2)
    model = _mk_static(
        static_spec=b3, dynamic_spec=b4, flow_spec=b4, time_diff=0.1,
        fuse_flow_grid=True,
    )
    pos = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 3))
    dirs = jnp.ones((4, 3, 3)) / jnp.sqrt(3.0)
    data = {
        "normed_timestamps": jnp.full((4, 3), 0.5),
        "img_idx": jnp.zeros((4, 3), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), pos, dirs, data)
    params = variables["params"]
    assert "dynflow_table" in params
    assert "dynamic_table" not in params and "flow_table" not in params

    out = model.apply(
        {"params": params}, pos, dirs, data, train=True,
        rngs={"aggregation": jax.random.PRNGKey(7)},
    )
    for k in (
        "forward_flow", "backward_flow",
        "forward_pred_backward_flow", "backward_pred_forward_flow",
    ):
        assert out[k].shape == (4, 3, 3), k

    # grads reach the fused table through flow warping + density
    def loss(p):
        o = model.apply(
            {"params": p}, pos, dirs, data, train=True,
            rngs={"aggregation": jax.random.PRNGKey(7)},
        )
        return (
            o["density"].sum()
            + (o["forward_flow"] ** 2).sum()
            + (o["forward_pred_backward_flow"] ** 2).sum()
        )

    g = jax.grad(loss)(params)
    gt = np.asarray(g["dynflow_table"])
    assert np.isfinite(gt).all() and np.abs(gt).sum() > 0

    # point-query APIs
    qpos = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    t = jnp.full((16,), 0.5)
    qf = model.apply({"params": params}, qpos, t,
                     method=RadianceField.query_flow)
    assert qf["forward_flow"].shape == (16, 3)
    qa = model.apply({"params": params}, qpos, t,
                     method=RadianceField.query_attributes)
    assert qa["density"].shape == (16,)


@pytest.mark.slow
def test_topk_temporal_aggregation():
    """With temporal_agg_topk=K, exactly K samples per ray get warped
    aggregation (agg_mask), non-selected samples keep their current-time
    features, and the cycle predictions are zero off-mask."""
    from emernerf_tpu.ops.brickgrid import BrickGridSpec

    b4 = BrickGridSpec(4, 4, 4, 32, 7, 2, time_pair=True)
    b3 = BrickGridSpec(3, 4, 4, 32, 8, 2)
    kw = dict(
        static_spec=b3, dynamic_spec=b4, flow_spec=b4, time_diff=0.1,
        fuse_flow_grid=True,
    )
    model_k = _mk_static(temporal_agg_topk=2, **kw)
    model_full = _mk_static(temporal_agg_topk=0, **kw)
    pos = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 3))
    dirs = jnp.ones((4, 6, 3)) / jnp.sqrt(3.0)
    data = {
        "normed_timestamps": jnp.full((4, 6), 0.5),
        "img_idx": jnp.zeros((4, 6), jnp.int32),
    }
    params = model_full.init(jax.random.PRNGKey(0), pos, dirs, data)["params"]

    rngs = {"aggregation": jax.random.PRNGKey(7)}
    out_k = model_k.apply({"params": params}, pos, dirs, data, train=True,
                          rngs=rngs)
    out_f = model_full.apply({"params": params}, pos, dirs, data, train=True,
                             rngs=rngs)

    mask = np.asarray(out_k["agg_mask"])
    assert mask.shape == (4, 6)
    np.testing.assert_array_equal(mask.sum(axis=1), np.full(4, 2.0))
    # cycle predictions vanish off-mask
    preds = np.asarray(out_k["forward_pred_backward_flow"])
    assert np.all(preds[mask == 0] == 0)
    assert np.abs(preds[mask == 1]).sum() > 0
    # same current-time flow either way
    np.testing.assert_allclose(
        np.asarray(out_k["forward_flow"]), np.asarray(out_f["forward_flow"]),
        rtol=1e-5, atol=1e-6,
    )
    # selected samples reproduce the full-path aggregated density exactly
    # (same noise rng -> same warp); non-selected differ in general
    dk = np.asarray(out_k["dynamic_density"])
    df = np.asarray(out_f["dynamic_density"])
    np.testing.assert_allclose(dk[mask == 1], df[mask == 1], rtol=1e-4,
                               atol=1e-6)
    # grads flow through the top-k path into the fused table
    def loss(p):
        o = model_k.apply({"params": p}, pos, dirs, data, train=True,
                          rngs=rngs)
        return o["density"].sum() + (o["forward_pred_backward_flow"] ** 2).sum()

    g = jax.grad(loss)(params)["dynflow_table"]
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_feature_head_and_learnable_pe():
    model = _mk_static(
        enable_feature_head=True, semantic_feature_dim=8,
        feature_embedding_dim=16, feature_mlp_layer_width=16,
        enable_learnable_pe=True, pe_map_hw=(8, 12),
    )
    pos = jnp.zeros((4, 3, 3))
    dirs = jnp.ones((4, 3, 3)) / jnp.sqrt(3.0)
    data = {
        "img_idx": jnp.zeros((4, 3), jnp.int32),
        "pixel_coords": jnp.asarray([[0.5, 0.5]] * 4),
    }
    params = model.init(jax.random.PRNGKey(0), pos, dirs, data)["params"]
    out = model.apply({"params": params}, pos, dirs, data)
    assert out["dino_feat"].shape == (4, 3, 16)
    assert out["dino_pe"].shape == (4, 16)


def test_query_attributes_and_flow():
    model = _mk_static(dynamic_spec=TINY4, flow_spec=TINY4, time_diff=0.1)
    pos = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    t = jnp.full((16,), 0.3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 2, 3)), jnp.ones((2, 2, 3)),
        {"normed_timestamps": jnp.zeros((2, 2))},
    )
    out = model.apply(variables, pos, t, method=RadianceField.query_flow)
    assert out["forward_flow"].shape == (16, 3)
    assert out["dynamic_density"].shape == (16,)
    attrs = model.apply(variables, pos, t, method=RadianceField.query_attributes)
    assert attrs["density"].shape == (16,)


def test_appearance_embedding_mean_fallback():
    model = _mk_static()
    pos = jnp.zeros((4, 3, 3))
    dirs = jnp.ones((4, 3, 3)) / jnp.sqrt(3.0)
    data_train = {"img_idx": jnp.zeros((4, 3), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), pos, dirs, data_train)["params"]
    # eval without img_idx must fall back to the mean embedding, not crash
    out = model.apply({"params": params}, pos, dirs, {})
    assert out["rgb"].shape == (4, 3, 3)


def test_find_topk_nearby_timesteps():
    from emernerf_tpu.models.fields import find_topk_nearby_timesteps

    ts = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    near = find_topk_nearby_timesteps(ts, jnp.asarray([0.26, 0.9]))
    np.testing.assert_allclose(np.asarray(near[0]), [0.25, 0.5])
    np.testing.assert_allclose(np.asarray(near[1]), [1.0, 0.75])


@pytest.mark.slow
def test_temporal_interpolation_flow_eval():
    """With enable_temporal_interpolation, an eval-time flow query at an
    off-grid timestep equals the lerp of the two nearest training-timestep
    encodings; at a training timestep it matches the exact query."""
    spec3 = HashGridSpec(3, 4, 8, 64, 10, 2)
    spec4 = HashGridSpec(4, 4, 8, 64, 10, 2)
    steps = (0.0, 0.5, 1.0)
    kw = dict(
        static_spec=spec3, dynamic_spec=spec4, flow_spec=spec4,
        aabb=(-5.0, -5.0, -5.0, 5.0, 5.0, 5.0), geometry_feature_dim=8,
        base_mlp_layer_width=16, head_mlp_layer_width=16,
        semantic_feature_dim=0, num_train_timesteps=3, time_diff=1.0 / 3,
    )
    model_interp = RadianceField(
        **kw, enable_temporal_interpolation=True, training_timesteps=steps
    )
    model_exact = RadianceField(**kw)
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (8, 4, 3), minval=-4, maxval=4)
    params = model_interp.init(
        {"params": key, "aggregation": key}, pos, jnp.ones((8, 4, 3)),
        {"normed_timestamps": jnp.full((8, 4), 0.5)}, train=False,
    )["params"]

    def qflow(model, t):
        return model.apply(
            {"params": params}, method="query_flow",
            positions=pos, normed_timestamps=jnp.full((8, 4), t),
        )

    # at a training timestep the interpolated query equals the exact one
    f_interp = qflow(model_interp, 0.5)
    f_exact = qflow(model_exact, 0.5)
    np.testing.assert_allclose(
        np.asarray(f_interp["forward_flow"]),
        np.asarray(f_exact["forward_flow"]), rtol=1e-5, atol=1e-6,
    )
    # off-grid: interpolated differs from the exact (unseen-cell) query but
    # stays finite
    g_interp = qflow(model_interp, 0.3)
    g_exact = qflow(model_exact, 0.3)
    assert np.isfinite(np.asarray(g_interp["forward_flow"])).all()
    assert not np.allclose(
        np.asarray(g_interp["forward_flow"]),
        np.asarray(g_exact["forward_flow"]),
    )


def test_sh_direction_encoding_head():
    spec3 = HashGridSpec(3, 4, 8, 64, 10, 2)
    model = RadianceField(
        static_spec=spec3, aabb=(-5.0, -5.0, -5.0, 5.0, 5.0, 5.0),
        geometry_feature_dim=8, base_mlp_layer_width=16,
        head_mlp_layer_width=16, semantic_feature_dim=0,
        enable_sky_head=True, direction_encoding="sh",
    )
    key = jax.random.PRNGKey(0)
    pos = jnp.zeros((4, 2, 3))
    dirs = jnp.ones((4, 2, 3)) / np.sqrt(3.0)
    params = model.init(key, pos, dirs, {})["params"]
    out = model.apply({"params": params}, pos, dirs, {})
    assert out["rgb"].shape == (4, 2, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
