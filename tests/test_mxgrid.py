"""MX grid (ops/mxgrid.py): the scatter-free MXU-native encoder.

The defining property is structural: the COMPILED forward+backward of an
encode must contain no scatter op at all — table gradients are dense
matmuls (tent-weight transpose) and one-hot contractions (brick coarse
levels).  Numerics are pinned against a naive gather-based reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emernerf_tpu.ops.mxgrid import (
    MXGridSpec,
    init_mxgrid_table,
    mxgrid_encode,
    mxgrid_encode_ref,
)


def _spec3(**kw):
    kw.setdefault("n_input_dims", 3)
    kw.setdefault("n_levels", 6)
    kw.setdefault("base_resolution", 8)
    kw.setdefault("max_resolution", 128)
    kw.setdefault("n_features_per_level", 4)
    kw.setdefault("rank", 4)
    kw.setdefault("chunk", 256)
    return MXGridSpec(**kw)


def _spec4(**kw):
    kw.setdefault("n_input_dims", 4)
    kw.setdefault("n_levels", 5)
    kw.setdefault("base_resolution", 8)
    kw.setdefault("max_resolution", 64)
    kw.setdefault("n_features_per_level", 8)
    kw.setdefault("rank", 4)
    kw.setdefault("time_resolution", 12)
    kw.setdefault("chunk", 256)
    return MXGridSpec(**kw)


@pytest.mark.parametrize("spec_fn", [_spec3, _spec4])
def test_forward_matches_naive_reference(spec_fn):
    spec = spec_fn()
    key = jax.random.PRNGKey(0)
    table = init_mxgrid_table(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1000, spec.n_input_dims))
    out = mxgrid_encode(table, x, spec)
    ref = mxgrid_encode_ref(table, x, spec)
    assert out.shape == (1000, spec.n_output_dims)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-3
    )


@pytest.mark.slow
@pytest.mark.parametrize("spec_fn", [_spec3, _spec4])
def test_gradients_match_naive_reference(spec_fn):
    """Table AND position cotangents agree with autodiff through the
    naive gather formulation."""
    spec = spec_fn()
    key = jax.random.PRNGKey(0)
    table = init_mxgrid_table(key, spec)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (257, spec.n_input_dims),  # non-chunk-divisible
        minval=0.01, maxval=0.99,
    )
    cot = jax.random.normal(jax.random.PRNGKey(2), (257, spec.n_output_dims))

    def loss(fn, t, p):
        return (fn(t, p, spec) * cot).sum()

    gt, gp = jax.grad(lambda t, p: loss(mxgrid_encode, t, p), (0, 1))(table, x)
    rt, rp = jax.grad(
        lambda t, p: loss(mxgrid_encode_ref, t, p), (0, 1)
    )(table, x)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(rt),
                               rtol=5e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("spec_fn", [_spec3, _spec4])
def test_backward_contains_no_scatter(spec_fn):
    """THE design property: the compiled fwd+bwd has no scatter op."""
    spec = spec_fn()
    table = init_mxgrid_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, spec.n_input_dims))

    def loss(t, p):
        return mxgrid_encode(t, p, spec).sum()

    import re

    hlo = (
        jax.jit(jax.grad(loss, (0, 1)))
        .lower(table, x)
        .compile()
        .as_text()
    )
    # match scatter OPS (`%x = ty[...] scatter(...)`), not the test's own
    # name embedded in op_name metadata
    ops = re.findall(r"=\s*\S+\s+scatter\(", hlo)
    assert not ops, f"mx backward emitted {len(ops)} scatter op(s)"


def test_brick_prefix_and_factored_split():
    spec = _spec3()
    # some coarse levels are brick, the rest factored; totals line up
    assert 1 <= spec.n_brick_levels < spec.n_levels
    assert spec.n_scales == spec.n_levels - spec.n_brick_levels
    assert spec.n_output_dims == spec.n_levels * spec.n_features_per_level
    # wide-F 4D grids may legitimately have no brick prefix
    s4 = _spec4()
    assert s4.n_brick_levels >= 0
    assert s4.brick_spec is None or not s4.brick_spec.level_uses_hash.any()
    # flat table padded for even ZeRO sharding
    assert spec.table_shape[0] % 1024 == 0
    assert spec.table_shape[0] >= spec.num_parameters


@pytest.mark.slow
def test_training_improves_psnr_with_mx_backend():
    """End-to-end: tiny flagship with grid_backend=mx trains on the
    synthetic dynamic scene and PSNR improves."""
    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship
    from emernerf_tpu.train.step import build_train_step, init_train_state

    cfg, dataset, model, prop_models, step_cfg = build_flagship(
        tiny=True,
        overrides=["nerf.model.grid_backend=mx", "optim.num_iters=60",
                   "data.ray_batch_size=512"],
    )
    scene = dataset.scene_tensors()
    key = jax.random.PRNGKey(0)
    pb = sample_pixel_batch(scene, key, 512, use_timestamps=True)
    lb = sample_lidar_batch(scene, key, 512)
    state = init_train_state(model, prop_models, step_cfg, key, pb)
    step_fn = build_train_step(model, prop_models, step_cfg)
    psnrs = []
    for it in range(60):
        key, kb, ks = jax.random.split(key, 3)
        pb = sample_pixel_batch(scene, kb, 512, use_timestamps=True)
        lb = sample_lidar_batch(scene, kb, 512)
        state, m = step_fn(state, pb, lb, ks, pixel_rg=True, lidar_rg=True)
        psnrs.append(float(m["psnr"]))
    assert np.isfinite(psnrs).all()
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:10]) + 1.0, (
        f"mx backend did not learn: {np.mean(psnrs[:10]):.2f} -> "
        f"{np.mean(psnrs[-10:]):.2f}"
    )
