"""Explicit-collective SPMD training (parallel/spmd.py) on the 8-virtual
-device CPU mesh: bf16 gradient psum and ZeRO (reduce-scattered big-table
grads + sharded Adam moments), VERDICT r2 #6.

The key property: ZeRO is a communication/memory LAYOUT change, not a
numerics change — with an fp32 wire it must produce the same parameters as
the replicated-Adam explicit path, while storing the big moment arrays
sharded 1/n per device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emernerf_tpu.parallel.mesh import make_mesh
from emernerf_tpu.parallel.spmd import (
    SpmdConfig,
    shard_state,
    state_partition_specs,
)
from emernerf_tpu.train.step import build_train_step, init_train_state

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

# tiny-flagship tables are ~100k-500k elems; force them through the ZeRO
# routing so the test exercises the sharded path
ZERO_MIN = 1 << 10


@pytest.fixture(scope="module")
def setup():
    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship

    cfg, dataset, model, prop_models, step_cfg = build_flagship(tiny=True)
    scene = dataset.scene_tensors()
    key = jax.random.PRNGKey(0)
    pixel_batch = sample_pixel_batch(
        scene, key, cfg.data.ray_batch_size, use_timestamps=True
    )
    lidar_batch = sample_lidar_batch(scene, key, cfg.data.ray_batch_size)
    state = init_train_state(model, prop_models, step_cfg, key, pixel_batch)

    def fresh_state():
        return jax.tree.map(jnp.copy, state)

    return model, prop_models, step_cfg, fresh_state, pixel_batch, lidar_batch


def _run_steps(model, props, step_cfg, state, pb, lb, mesh, spmd, n=2):
    state = shard_state(state, mesh, spmd)
    step_fn = build_train_step(model, props, step_cfg, mesh=mesh, spmd=spmd)
    key = jax.random.PRNGKey(7)
    for i in range(n):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, pb, lb, k,
                                 pixel_rg=True, lidar_rg=True)
    return state, metrics


def _max_rel_diff(a, b):
    worst = 0.0
    for la, lb_ in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        la = np.asarray(la, np.float32)
        lb_ = np.asarray(lb_, np.float32)
        denom = np.maximum(np.abs(la), 1e-3)
        worst = max(worst, float(np.max(np.abs(la - lb_) / denom)))
    return worst


@pytest.mark.slow
def test_zero_matches_replicated_with_fp32_wire(setup):
    """ZeRO (reduce-scatter + sharded Adam + all-gathered direction) is
    numerically the same optimizer as replicated Adam when every wire is
    fp32 — only the layout differs."""
    model, props, step_cfg, fresh, pb, lb = setup
    mesh = make_mesh(8)
    rep = SpmdConfig(grad_psum_dtype="float32", zero=False,
                     direction_dtype="float32", zero_min_elems=ZERO_MIN)
    zero = SpmdConfig(grad_psum_dtype="float32", zero=True,
                      direction_dtype="float32", zero_min_elems=ZERO_MIN)
    s_rep, m_rep = _run_steps(model, props, step_cfg, fresh(), pb, lb,
                              mesh, rep)
    s_zero, m_zero = _run_steps(model, props, step_cfg, fresh(), pb, lb,
                                mesh, zero)
    diff = _max_rel_diff(s_rep.params, s_zero.params)
    assert diff < 1e-4, f"zero vs replicated param drift {diff:.2e}"
    assert np.isfinite(float(m_zero["psnr"]))
    # the moments really are sharded: the big mu leaves hold 1/8 per device
    specs = state_partition_specs(s_zero, zero, 8)
    sharded_leaves = [
        (l, s)
        for l, s in zip(jax.tree.leaves(s_zero.opt_state),
                        jax.tree.leaves(specs.opt_state))
        if s == jax.sharding.PartitionSpec("data")
    ]
    assert sharded_leaves, "no moment leaf routed through ZeRO"
    for leaf, _ in sharded_leaves:
        shard = leaf.addressable_shards[0]
        assert shard.data.shape[0] == leaf.shape[0] // 8


@pytest.mark.slow
def test_bf16_wire_close_to_fp32_wire(setup):
    """bf16 gradient psum (+ bf16 direction all-gather under ZeRO) stays
    within bf16-noise of the fp32-wire path after 2 steps."""
    model, props, step_cfg, fresh, pb, lb = setup
    mesh = make_mesh(8)
    f32 = SpmdConfig(grad_psum_dtype="float32", zero=True,
                     direction_dtype="float32", zero_min_elems=ZERO_MIN)
    b16 = SpmdConfig(grad_psum_dtype="bfloat16", zero=True,
                     direction_dtype="bfloat16", zero_min_elems=ZERO_MIN)
    s_f32, _ = _run_steps(model, props, step_cfg, fresh(), pb, lb, mesh, f32)
    s_b16, m = _run_steps(model, props, step_cfg, fresh(), pb, lb, mesh, b16)
    assert np.isfinite(float(m["psnr"]))
    # params move by ~lr*direction per step; bf16 wire perturbs the
    # direction by ~2^-8 relative — after 2 steps the params should agree
    # to much better than a percent
    diff = _max_rel_diff(s_f32.params, s_b16.params)
    assert diff < 5e-2, f"bf16 wire drifted {diff:.2e} from fp32"


def test_zero_hlo_contains_reduce_scatter_and_all_gather(setup):
    """The compiled ZeRO step really communicates via reduce-scatter +
    all-gather (not a full-gradient all-reduce) for the big tables."""
    model, props, step_cfg, fresh, pb, lb = setup
    mesh = make_mesh(8)
    zero = SpmdConfig(grad_psum_dtype="bfloat16", zero=True,
                      zero_min_elems=ZERO_MIN)
    state = shard_state(fresh(), mesh, zero)
    step_fn = build_train_step(model, props, step_cfg, mesh=mesh, spmd=zero)
    lowered = step_fn.lower(state, pb, lb, jax.random.PRNGKey(0),
                            pixel_rg=True, lidar_rg=True)
    hlo = lowered.compile().as_text()
    assert "reduce-scatter" in hlo, "no reduce-scatter in compiled ZeRO step"
    assert "all-gather" in hlo, "no all-gather in compiled ZeRO step"


@pytest.mark.slow
def test_spmd_default_runs_and_metrics_finite(setup):
    """Default SpmdConfig (bf16 psum, no ZeRO) trains: finite metrics and
    an advancing step counter on the 8-device mesh."""
    model, props, step_cfg, fresh, pb, lb = setup
    mesh = make_mesh(8)
    state, metrics = _run_steps(model, props, step_cfg, fresh(), pb, lb,
                                mesh, SpmdConfig(), n=1)
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"non-finite metric {k}"
