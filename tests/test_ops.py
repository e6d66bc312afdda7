"""Unit tests for the kernel substrate (ops/)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emernerf_tpu.ops.activations import density_activation, trunc_exp
from emernerf_tpu.ops.contraction import contract_merf, inside_unit_cube_selector
from emernerf_tpu.ops.hashgrid import (
    HashGridSpec,
    _corner_offsets,
    hashgrid_encode,
    init_hashgrid_table,
)
from emernerf_tpu.ops.interp import grid_sample_2d
from emernerf_tpu.ops.sinusoidal import sinusoidal_encode, sinusoidal_output_dim

_PRIMES = (1, 2654435761, 805459861, 3674653429)


# --------------------------------------------------------------------------
# trunc_exp
# --------------------------------------------------------------------------
def test_trunc_exp_forward_matches_exp():
    x = jnp.linspace(-5, 20, 50)
    np.testing.assert_allclose(trunc_exp(x), np.exp(np.asarray(x)), rtol=1e-5)


def test_trunc_exp_gradient_clamped():
    g = jax.grad(lambda x: trunc_exp(x))(20.0)
    assert np.isclose(float(g), math.exp(15.0), rtol=1e-5)
    g2 = jax.grad(lambda x: trunc_exp(x))(2.0)
    assert np.isclose(float(g2), math.exp(2.0), rtol=1e-5)


def test_density_activation_shift():
    np.testing.assert_allclose(
        density_activation(jnp.asarray(1.0)), 1.0, rtol=1e-6
    )


# --------------------------------------------------------------------------
# contraction
# --------------------------------------------------------------------------
def _contract_oracle(x, aabb):
    """Numpy re-derivation of the MERF contraction (nerf_utils.py:13-28)."""
    aabb_min, aabb_max = aabb[:3], aabb[3:]
    x = (x - aabb_min) / (aabb_max - aabb_min)
    x = x * 2 - 1
    mag = np.max(np.abs(x), axis=-1, keepdims=True)
    x = np.where(mag < 1, x, (2 - 1 / mag) * (x / mag))
    return x / 4 + 0.5


def test_contract_matches_oracle():
    rng = np.random.default_rng(0)
    aabb = np.array([-20.0, -40.0, 0.0, 80.0, 40.0, 20.0], np.float32)
    x = rng.uniform(-300, 300, (1000, 3)).astype(np.float32)
    got = contract_merf(jnp.asarray(x), jnp.asarray(aabb))
    np.testing.assert_allclose(got, _contract_oracle(x, aabb), rtol=2e-5, atol=2e-6)


def test_contract_range():
    rng = np.random.default_rng(1)
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    x = jnp.asarray(rng.uniform(-1e5, 1e5, (500, 3)).astype(np.float32))
    y = contract_merf(x, aabb)
    assert jnp.all(y >= 0.0) and jnp.all(y <= 1.0)


def test_selector():
    normed = jnp.asarray([[0.5, 0.5, 0.5], [1.2, 0.5, 0.5], [0.0, 0.5, 0.5]])
    sel = inside_unit_cube_selector(normed)
    np.testing.assert_array_equal(np.asarray(sel), [1.0, 0.0, 0.0])


# --------------------------------------------------------------------------
# sinusoidal encoding
# --------------------------------------------------------------------------
def test_sinusoidal_dims_and_values():
    x = jnp.asarray([[0.1, 0.2, 0.3]])
    out = sinusoidal_encode(x, min_deg=0, max_deg=4)
    assert out.shape == (1, sinusoidal_output_dim(3, 0, 4))
    assert out.shape[-1] == 33
    np.testing.assert_allclose(out[0, :3], x[0], rtol=1e-6)
    # first sin block: sin(x * 2^0)
    np.testing.assert_allclose(out[0, 3:6], np.sin(np.asarray(x[0])), rtol=1e-6)
    # cos block lives after all 15 sin entries: sin(xb + pi/2) = cos(xb)
    np.testing.assert_allclose(out[0, 18:21], np.cos(np.asarray(x[0])), rtol=1e-5)


# --------------------------------------------------------------------------
# hash grid
# --------------------------------------------------------------------------
def _hashgrid_oracle(table, x, spec):
    """Independent numpy implementation of Instant-NGP hash encoding.
    Accepts the framework's feature-major (F, L*T) table."""
    table = np.asarray(table).T  # -> (L*T, F) for the oracle's indexing
    x = np.asarray(x, np.float64)
    n, d = x.shape
    t = spec.table_entries_per_level
    out = np.zeros((n, spec.n_levels, spec.n_features_per_level))
    offsets = _corner_offsets(d)
    for lvl in range(spec.n_levels):
        scale = spec.level_scales[lvl]
        res = spec.level_resolutions[lvl]
        pos = x * scale + 0.5
        grid = np.floor(pos).astype(np.int64)
        frac = pos - grid
        for c in range(2**d):
            corner = grid + offsets[c]
            if res**d > t:
                idx = np.zeros(n, np.uint64)
                for i in range(d):
                    idx ^= (corner[:, i].astype(np.uint64) * np.uint64(_PRIMES[i])) & np.uint64(
                        0xFFFFFFFF
                    )
            else:
                idx = np.zeros(n, np.uint64)
                stride = 1
                for i in range(d):
                    idx += corner[:, i].astype(np.uint64) * np.uint64(stride & 0xFFFFFFFF)
                    stride *= int(res)
            idx = (idx & np.uint64(0xFFFFFFFF)) % np.uint64(t)
            w = np.prod(
                np.where(offsets[c] == 1, frac, 1 - frac), axis=-1
            )
            out[:, lvl] += table[lvl * t + idx.astype(np.int64)] * w[:, None]
    return out.reshape(n, -1)


@pytest.mark.parametrize("dims", [3, 4])
def test_hashgrid_matches_oracle(dims):
    spec = HashGridSpec(
        n_input_dims=dims,
        n_levels=4,
        base_resolution=4,
        max_resolution=64,
        log2_hashmap_size=9,
        n_features_per_level=2,
    )
    key = jax.random.PRNGKey(0)
    table = init_hashgrid_table(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, dims))
    got = hashgrid_encode(table, x, spec)
    want = _hashgrid_oracle(table, x, spec)
    assert got.shape == (64, spec.n_output_dims)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-8)


def test_hashgrid_levels_use_expected_indexing():
    spec = HashGridSpec(
        n_input_dims=3,
        n_levels=6,
        base_resolution=4,
        max_resolution=128,
        log2_hashmap_size=10,
        n_features_per_level=1,
    )
    uses_hash = spec.level_uses_hash
    # coarse levels fit in 1024 entries, fine levels must hash
    assert not uses_hash[0]
    assert uses_hash[-1]


def test_hashgrid_gradients_flow_to_table():
    spec = HashGridSpec(
        n_input_dims=3, n_levels=2, base_resolution=4, max_resolution=8,
        log2_hashmap_size=8, n_features_per_level=2,
    )
    table = init_hashgrid_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    def f(tab):
        return hashgrid_encode(tab, x, spec).sum()

    g = jax.grad(f)(table)
    assert g.shape == spec.table_shape
    # total interpolation weight per (point, level) is 1, so the gradient of
    # the sum must total n_points * n_levels per feature channel
    np.testing.assert_allclose(
        np.asarray(g).sum(axis=1), [32.0, 32.0], rtol=1e-5
    )


def test_hashgrid_batched_shape():
    spec = HashGridSpec(n_input_dims=3, n_levels=2, base_resolution=4,
                        max_resolution=8, log2_hashmap_size=8,
                        n_features_per_level=2)
    table = init_hashgrid_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 7, 3))
    out = hashgrid_encode(table, x, spec)
    assert out.shape == (5, 7, spec.n_output_dims)


# --------------------------------------------------------------------------
# grid_sample
# --------------------------------------------------------------------------
def test_grid_sample_center_and_corner():
    img = jnp.arange(12.0).reshape(3, 4, 1)
    # center of pixel (1, 1): normalized coords with align_corners=False
    gx = jnp.asarray([(1 + 0.5) * 2 / 4 - 1])
    gy = jnp.asarray([(1 + 0.5) * 2 / 3 - 1])
    out = grid_sample_2d(img, gx, gy)
    np.testing.assert_allclose(np.asarray(out), [[5.0]], atol=1e-6)


def test_grid_sample_zero_padding():
    img = jnp.ones((4, 4, 2))
    out = grid_sample_2d(img, jnp.asarray([-1.5]), jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(out), [[0.0, 0.0]], atol=1e-6)


def test_hashgrid_custom_vjp_matches_autodiff():
    """The memory-lean custom VJP must produce the same gradients (both for
    the table and for positions) as plain autodiff of the reference impl."""
    from emernerf_tpu.ops.hashgrid import hashgrid_encode_ref

    for dims in (3, 4):
        spec = HashGridSpec(
            n_input_dims=dims, n_levels=3, base_resolution=4,
            max_resolution=32, log2_hashmap_size=8, n_features_per_level=2,
        )
        table = init_hashgrid_table(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, dims),
                               minval=0.05, maxval=0.95)
        cot = jax.random.normal(jax.random.PRNGKey(2),
                                (32, spec.n_output_dims))

        def loss_custom(t, p):
            return (hashgrid_encode(t, p, spec) * cot).sum()

        def loss_ref(t, p):
            return (hashgrid_encode_ref(t, p, spec) * cot).sum()

        gt_c, gp_c = jax.grad(loss_custom, argnums=(0, 1))(table, x)
        gt_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(table, x)
        np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_r),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_r),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_hashgrid_gather_modes_agree(monkeypatch):
    """The 1d and (chunked) 2d gather formulations are numerically
    identical, including across chunk boundaries."""
    import emernerf_tpu.ops.hashgrid as hg

    spec = HashGridSpec(
        n_input_dims=3, n_levels=3, base_resolution=4, max_resolution=32,
        log2_hashmap_size=8, n_features_per_level=2,
    )
    table = init_hashgrid_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (50, 3))
    cot = jax.random.normal(jax.random.PRNGKey(2), (50, spec.n_output_dims))

    monkeypatch.setattr(hg, "_CHUNK_ELEMS", 64)  # force many chunks

    results = {}
    for mode in ("1d", "2d"):
        monkeypatch.setenv("EMERNERF_GATHER", mode)
        out = hg.hashgrid_encode(table, x, spec)
        gt, gp = jax.grad(
            lambda t_, p_: (hg.hashgrid_encode(t_, p_, spec) * cot).sum(),
            argnums=(0, 1),
        )(table, x)
        results[mode] = (np.asarray(out), np.asarray(gt), np.asarray(gp))

    for a, b in zip(results["1d"], results["2d"]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
