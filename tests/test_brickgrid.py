"""Brick-grid encoder correctness: numpy oracle, custom-VJP gradients,
continuity inside bricks, and 4D time interpolation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emernerf_tpu.ops.brickgrid import (
    BrickGridSpec,
    brickgrid_encode,
    brickgrid_encode_ref,
    init_brickgrid_table,
)

_PRIMES = (1, 2654435761, 805459861, 3674653429)


def _oracle(table, x, spec):
    """Independent numpy reimplementation: per-point loop over levels and
    the 8 (16 for 4D) cell corners, reading features out of brick rows."""
    table = np.asarray(table, np.float64)
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    f = spec.n_features_per_level
    d_sp = spec.spatial_dims
    out = np.zeros((n, spec.n_levels * f))
    bres = spec.brick_resolutions
    for lvl in range(spec.n_levels):
        scale = spec.level_scales[lvl]
        uses_hash = spec.level_uses_hash[lvl]
        for p in range(n):
            pos = x[p, :d_sp] * scale + 0.5
            cell = np.floor(pos).astype(np.int64)
            frac = pos - cell
            if spec.has_time:
                tpos = x[p, 3] * scale + 0.5
                t_cell = int(np.floor(tpos))
                t_frac = tpos - t_cell
                if spec.time_pair:
                    # one row per time cell holds both time corners:
                    # half 0 = corner t, half 1 = corner t+1
                    t_iters = [(t_cell, 1 - t_frac, 0), (t_cell, t_frac, 1)]
                else:
                    t_iters = [(t_cell, 1 - t_frac, 0), (t_cell + 1, t_frac, 0)]
            else:
                t_iters = [(None, 1.0, 0)]
            acc = np.zeros(f)
            for t_c, t_w, t_half in t_iters:
                brick = cell >> spec.log2_brick_size
                o = cell & (spec.brick_cells - 1)
                # row for this brick (+ time)
                if uses_hash:
                    h = np.uint32(0)
                    for i in range(d_sp):
                        h ^= np.uint32(
                            (np.uint64(brick[i]) * np.uint64(_PRIMES[i]))
                            & np.uint64(0xFFFFFFFF)
                        )
                    if t_c is not None:
                        h ^= np.uint32(
                            (np.uint64(t_c) * np.uint64(_PRIMES[3]))
                            & np.uint64(0xFFFFFFFF)
                        )
                    row = int(h) & (spec.bricks_per_level - 1)
                else:
                    row = 0
                    for i in range(d_sp):
                        row += int(brick[i]) * int(bres[lvl]) ** i
                    if t_c is not None:
                        row += int(t_c) * int(bres[lvl]) ** d_sp
                    row &= spec.bricks_per_level - 1
                row += lvl * spec.bricks_per_level
                half_off = t_half * spec.corners_per_brick * f
                for c in range(1 << d_sp):
                    w = t_w
                    lane_digits = []
                    for i in range(d_sp):
                        bit = (c >> i) & 1
                        w *= frac[i] if bit else (1 - frac[i])
                        lane_digits.append(int(o[i]) + bit)
                    lane = 0
                    for i in reversed(range(d_sp)):
                        lane = lane * spec.CPA + lane_digits[i]
                    acc += w * table[
                        row, half_off + lane * f : half_off + (lane + 1) * f
                    ]
            out[p, lvl * f : (lvl + 1) * f] = acc
    return out


SPEC3 = BrickGridSpec(3, 4, 8, 64, 8, 2)
SPEC4 = BrickGridSpec(4, 3, 8, 32, 7, 2)
# 4x4x4-cell bricks (125-corner rows), F=1 — the proposal-grid layout
SPEC3_B4 = BrickGridSpec(3, 3, 8, 64, 6, 1, log2_brick_size=2)
# time-paired 4D rows (production 4D layout): one gather per (point, level)
SPEC4_TP = BrickGridSpec(4, 3, 8, 32, 7, 2, time_pair=True)

ALL_SPECS = [SPEC3, SPEC4, SPEC3_B4, SPEC4_TP]
ALL_IDS = ["3d", "4d", "3d_b4", "4d_tpair"]


@pytest.mark.parametrize("spec", ALL_SPECS, ids=ALL_IDS)
def test_brickgrid_matches_numpy_oracle(spec):
    key = jax.random.PRNGKey(0)
    table = init_brickgrid_table(key, spec, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, spec.n_input_dims))
    got = np.asarray(brickgrid_encode(table, x, spec))
    want = _oracle(table, x, spec)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("posgrad_mode", ["fwd", "regather"])
@pytest.mark.parametrize("spec", ALL_SPECS, ids=ALL_IDS)
def test_brickgrid_custom_vjp_matches_autodiff(spec, posgrad_mode,
                                               monkeypatch):
    monkeypatch.setenv("EMERNERF_POSGRAD", posgrad_mode)
    key = jax.random.PRNGKey(0)
    table = init_brickgrid_table(key, spec, scale=1.0)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (32, spec.n_input_dims), minval=0.05,
        maxval=0.95,
    )
    g = jax.random.normal(jax.random.PRNGKey(2), (32, spec.n_output_dims))

    def loss_custom(tab, pts):
        return (brickgrid_encode(tab, pts, spec) * g).sum()

    def loss_ref(tab, pts):
        return (brickgrid_encode_ref(tab, pts, spec) * g).sum()

    gt_c, gx_c = jax.grad(loss_custom, argnums=(0, 1))(table, x)
    gt_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    assert np.abs(np.asarray(gt_c)).sum() > 0
    assert np.abs(np.asarray(gx_c)).sum() > 0


@pytest.mark.slow
def test_brickgrid_scatter_modes_agree(monkeypatch):
    spec = SPEC3
    table = init_brickgrid_table(jax.random.PRNGKey(0), spec, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (64, spec.n_output_dims))

    def table_grad():
        return jax.grad(
            lambda tab: (brickgrid_encode(tab, x, spec) * g).sum()
        )(table)

    monkeypatch.setenv("EMERNERF_SCATTER", "flat")
    g_flat = np.asarray(table_grad())
    monkeypatch.setenv("EMERNERF_SCATTER", "wide")
    g_wide = np.asarray(table_grad())
    np.testing.assert_allclose(g_flat, g_wide, rtol=1e-5, atol=1e-6)


def test_brickgrid_reduce_modes_agree(monkeypatch):
    spec = SPEC4
    table = init_brickgrid_table(jax.random.PRNGKey(0), spec, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 4))
    monkeypatch.setenv("EMERNERF_REDUCE", "unroll")
    a = np.asarray(brickgrid_encode(table, x, spec))
    monkeypatch.setenv("EMERNERF_REDUCE", "einsum")
    b = np.asarray(brickgrid_encode(table, x, spec))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    monkeypatch.setenv("EMERNERF_REDUCE", "dot")
    c = np.asarray(brickgrid_encode(table, x, spec))
    np.testing.assert_allclose(a, c, rtol=2e-5, atol=2e-6)


def test_brickgrid_dot_reduce_grads_agree(monkeypatch):
    """The 'dot' reduce (MXU selection-matrix contraction) must produce
    the same table AND position gradients as 'unroll' — the fwd-saved
    position-grad aux path switches to lane-decoded derivative rows."""
    spec = SPEC4
    table = init_brickgrid_table(jax.random.PRNGKey(0), spec, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 4))
    g = jax.random.normal(jax.random.PRNGKey(2), (64, spec.n_output_dims))

    def grads():
        return jax.grad(
            lambda tab, p: (brickgrid_encode(tab, p, spec, True) * g).sum(),
            argnums=(0, 1),
        )(table, x)

    monkeypatch.setenv("EMERNERF_REDUCE", "unroll")
    gt_a, gp_a = (np.asarray(v) for v in grads())
    monkeypatch.setenv("EMERNERF_REDUCE", "dot")
    gt_b, gp_b = (np.asarray(v) for v in grads())
    np.testing.assert_allclose(gt_a, gt_b, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(gp_a, gp_b, rtol=2e-4, atol=2e-4)


def test_brickgrid_continuous_inside_brick():
    """The field is trilinear (C0) within a brick: walking across a cell
    face INSIDE a brick must be continuous."""
    spec = BrickGridSpec(3, 1, 8, 8, 10, 2)  # single dense level, scale 7
    table = init_brickgrid_table(jax.random.PRNGKey(0), spec, scale=1.0)
    # cell boundary inside a brick: pos = k + 0.5 with k odd -> cell k-1|k
    # pos = x*7 + 0.5 -> x = k/7 crosses cell boundary at pos=k+0.5
    eps = 1e-5
    for k in (1, 3, 5):  # odd k: boundary between the two cells of a brick
        x_lo = jnp.array([[k / 7.0 - eps, 0.3, 0.4]])
        x_hi = jnp.array([[k / 7.0 + eps, 0.3, 0.4]])
        lo = np.asarray(brickgrid_encode(table, x_lo, spec))
        hi = np.asarray(brickgrid_encode(table, x_hi, spec))
        np.testing.assert_allclose(lo, hi, atol=1e-3)


def test_brickgrid_dtype_bf16_table():
    spec = SPEC3
    table = init_brickgrid_table(
        jax.random.PRNGKey(0), spec, dtype=jnp.bfloat16, scale=1.0
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    out = brickgrid_encode(table, x, spec)
    assert out.dtype == jnp.bfloat16
    gt = jax.grad(
        lambda tab: (brickgrid_encode(tab, x, spec).astype(jnp.float32)).sum()
    )(table)
    assert gt.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(gt.astype(jnp.float32)).all())


@pytest.mark.slow
def test_brick_vs_hash_psnr_parity():
    """Train the same tiny scene with exact-hash and brick backends; final
    PSNR must be comparable (brick grids trade corner sharing across brick
    planes for 8x fewer gathers — this guards the quality side)."""
    from functools import partial

    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.models.fields import DensityField, RadianceField
    from emernerf_tpu.ops.hashgrid import HashGridSpec
    from emernerf_tpu.render.prop_sampler import proposal_requires_grad_schedule
    from emernerf_tpu.train.step import (
        TrainStepConfig,
        build_train_step,
        init_train_state,
    )
    from tests.test_train import _make_scene

    scene_np, scene = _make_scene(dynamic=False)
    aabb = tuple(float(v) for v in scene_np["aabb"])

    def run(backend):
        if backend == "hash":
            spec3 = HashGridSpec(3, 6, 8, 256, 14, 2)
            pspec = HashGridSpec(3, 4, 8, 128, 14, 1)
        else:
            spec3 = BrickGridSpec(3, 6, 8, 256, 11, 2)
            pspec = BrickGridSpec(3, 4, 8, 128, 11, 1)
        model = RadianceField(
            static_spec=spec3, aabb=aabb, geometry_feature_dim=16,
            base_mlp_layer_width=32, head_mlp_layer_width=32,
            semantic_feature_dim=0, enable_img_embedding=True,
            num_train_timesteps=scene_np["num_frames"],
            num_cams=scene_np["num_cams"], appearance_embedding_dim=4,
            enable_sky_head=True, time_diff=scene_np["time_diff"],
        )
        props = [DensityField(spec=pspec, aabb=aabb, base_mlp_layer_width=32)]
        cfg = TrainStepConfig(
            num_samples=16, prop_samples=(24,), use_sky_loss=True,
            has_lidar=True, num_iters=2000, los_enable=True,
            los_start_iter=50, lr=0.01,
        )
        key = jax.random.PRNGKey(0)
        pb = sample_pixel_batch(scene, key, 256)
        state = init_train_state(model, props, cfg, key, pb)
        step_fn = build_train_step(model, props, cfg)
        rg_fn = proposal_requires_grad_schedule()
        sample_p = jax.jit(partial(sample_pixel_batch, num_rays=256))
        sample_l = jax.jit(partial(sample_lidar_batch, num_rays=256))
        psnrs = []
        for i in range(60):
            key, k1, k2, k3 = jax.random.split(key, 4)
            state, m = step_fn(
                state, sample_p(scene, k1), sample_l(scene, k2), k3,
                pixel_rg=rg_fn(i), lidar_rg=rg_fn(i),
            )
            psnrs.append(float(m["psnr"]))
        return np.mean(psnrs[-5:])

    psnr_hash = run("hash")
    psnr_brick = run("brick")
    print(f"\n[parity] hash={psnr_hash:.3f} dB brick={psnr_brick:.3f} dB "
          f"delta={psnr_brick - psnr_hash:+.3f}")
    # both must train, and brick must be within 0.3 dB of the exact hash
    # (measured: brick LEADS hash by ~+0.44 dB at this scale; the gate was
    # 1.5 dB in round 1, 0.5 in round 2 — now at the VERDICT #2 target)
    assert psnr_brick > 15.0, f"brick failed to train: {psnr_brick:.2f} dB"
    assert psnr_brick > psnr_hash - 0.3, (
        f"brick quality gap too large: {psnr_brick:.2f} vs {psnr_hash:.2f}"
    )


# --------------------------------------------------------------------------
# one-hot MXU table grads + stochastic grad subsampling (round-2 scatter
# replacements, perf/bench_scatter_alts.py)
# --------------------------------------------------------------------------
# 4D specs with big enough tables that coarse levels stay DENSE (the
# default SPEC4/SPEC4_TP are fully hashed, which would make the one-hot
# parity test vacuous)
SPEC4_DENSE = BrickGridSpec(4, 3, 8, 32, 12, 2)
SPEC4_TP_DENSE = BrickGridSpec(4, 3, 8, 32, 12, 2, time_pair=True)


@pytest.mark.parametrize(
    "spec",
    [SPEC3, SPEC3_B4, SPEC4_DENSE, SPEC4_TP_DENSE],
    ids=["3d", "3d_b4", "4d_dense", "4d_tpair_dense"],
)
def test_onehot_grad_matches_scatter(spec, monkeypatch):
    """Dense small levels' one-hot MXU grads equal the scatter-add grads
    (hi/lo bf16-split accumulation: ~2^-16 relative)."""
    table = init_brickgrid_table(jax.random.PRNGKey(0), spec, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, spec.n_input_dims))
    g = jax.random.normal(jax.random.PRNGKey(2), (64, spec.n_output_dims))

    def table_grad():
        return jax.grad(
            lambda tab: (brickgrid_encode(tab, x, spec) * g).sum()
        )(table)

    assert any(
        not h and int(r) * spec.row_width <= spec.onehot_budget
        for h, r in zip(spec.level_uses_hash, spec.level_rows)
    ), "spec has no one-hot-eligible level; test is vacuous"
    monkeypatch.setenv("EMERNERF_ONEHOT", "0")
    g_scatter = np.asarray(table_grad())
    monkeypatch.delenv("EMERNERF_ONEHOT")
    g_onehot = np.asarray(table_grad())
    np.testing.assert_allclose(g_onehot, g_scatter, rtol=1e-4, atol=1e-5)


def test_grad_subsample_scaling_and_mass():
    """grad_subsample keeps the total gradient mass exact (each point
    contributes total corner weight 1 per level), while actually changing
    which rows receive it."""
    import dataclasses

    base = dataclasses.replace(SPEC3, onehot_budget=0)
    sub = dataclasses.replace(base, grad_subsample=2)
    table = init_brickgrid_table(jax.random.PRNGKey(0), base, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
    ones = jnp.ones((128, base.n_output_dims))

    def table_grad(spec):
        return np.asarray(
            jax.grad(
                lambda tab: (brickgrid_encode(tab, x, spec) * ones).sum()
            )(table)
        )

    g_full = table_grad(base)
    g_sub = table_grad(sub)
    b = base.bricks_per_level
    for lvl in range(base.n_levels):
        m_full = g_full[lvl * b : (lvl + 1) * b].sum()
        m_sub = g_sub[lvl * b : (lvl + 1) * b].sum()
        # per level: total mass == n * F exactly, subsampled or not
        np.testing.assert_allclose(m_full, 128 * base.n_features_per_level,
                                   rtol=1e-4)
        np.testing.assert_allclose(m_sub, m_full, rtol=1e-4)
    # the hashed levels' grads must differ (the path really subsampled)
    hashed = np.flatnonzero(base.level_uses_hash)
    assert hashed.size > 0
    lvl = int(hashed[0])
    assert not np.allclose(
        g_full[lvl * b : (lvl + 1) * b], g_sub[lvl * b : (lvl + 1) * b]
    )
    # ... and dense levels' grads must NOT (subsample applies to hashed only)
    dense = np.flatnonzero(~base.level_uses_hash)
    if dense.size:
        lvl = int(dense[0])
        np.testing.assert_allclose(
            g_full[lvl * b : (lvl + 1) * b],
            g_sub[lvl * b : (lvl + 1) * b],
            rtol=1e-5, atol=1e-6,
        )


def test_grad_subsample_identical_points_exact():
    """With every point identical, any stride subsample scaled by k gives
    exactly the full gradient."""
    import dataclasses

    sub = dataclasses.replace(SPEC4_TP, onehot_budget=0, grad_subsample=4)
    base = dataclasses.replace(SPEC4_TP, onehot_budget=0)
    table = init_brickgrid_table(jax.random.PRNGKey(0), base, scale=1.0)
    x = jnp.tile(jnp.asarray([[0.3, 0.6, 0.2, 0.45]]), (64, 1))
    g = jnp.tile(
        jax.random.normal(jax.random.PRNGKey(2), (1, base.n_output_dims)),
        (64, 1),
    )

    def table_grad(spec):
        return np.asarray(
            jax.grad(
                lambda tab: (brickgrid_encode(tab, x, spec) * g).sum()
            )(table)
        )

    np.testing.assert_allclose(table_grad(sub), table_grad(base),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- #
# Coarse view (view_levels) + footprint-based fine-level skipping
# ---------------------------------------------------------------- #


def test_view_levels_forward_matches_full_prefix():
    """Encoding a coarse view (sliced table, view_levels=Lc) must be
    bit-identical to the first Lc*F output dims of the full encode —
    the view changes WHICH levels run, never their geometry."""
    import dataclasses

    spec = SPEC3
    key = jax.random.PRNGKey(0)
    table = init_brickgrid_table(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    full = brickgrid_encode(table, x, spec)
    for lc in (1, 2, 3):
        cspec = dataclasses.replace(spec, view_levels=lc)
        ctab = jax.lax.slice_in_dim(table, 0, lc * spec.bricks_per_level)
        view = brickgrid_encode(ctab, x, cspec)
        assert view.shape == (257, lc * spec.n_features_per_level)
        np.testing.assert_array_equal(
            np.asarray(view),
            np.asarray(full[:, : lc * spec.n_features_per_level]),
        )


def test_view_levels_vjp_matches_full_with_zero_fine_cotangent():
    """Pullback through the view == coarse-row slice of the pullback
    through the full encode with the fine cotangent dims zeroed (exact
    algebraic identity; validates the view's custom VJP end to end)."""
    import dataclasses

    spec = SPEC3
    lc = 2
    b = spec.bricks_per_level
    f = spec.n_features_per_level
    key = jax.random.PRNGKey(2)
    table = init_brickgrid_table(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(3), (129, 3))
    cspec = dataclasses.replace(spec, view_levels=lc)

    g = jax.random.normal(jax.random.PRNGKey(4), (129, lc * f))

    def view_fn(tab):
        ctab = jax.lax.slice_in_dim(tab, 0, lc * b)
        return (brickgrid_encode(ctab, x, cspec) * g).sum()

    g_pad = jnp.concatenate(
        [g, jnp.zeros((129, (spec.n_levels - lc) * f))], axis=-1
    )

    def full_fn(tab):
        return (brickgrid_encode(tab, x, spec) * g_pad).sum()

    d_view = jax.grad(view_fn)(table)
    d_full = jax.grad(full_fn)(table)
    np.testing.assert_allclose(
        np.asarray(d_view[: lc * b]), np.asarray(d_full[: lc * b]),
        rtol=0, atol=0,
    )
    assert float(jnp.abs(d_view[lc * b:]).max()) == 0.0


def test_density_field_fine_level_skip_near_segment_exact():
    """With fine_level_skip on, the NEAR samples' densities are
    bit-identical to the unskipped field (they see the full encoding);
    only far samples change (their fine features are zero)."""
    from emernerf_tpu.models.fields import DensityField

    spec = SPEC3
    kw = dict(spec=spec, aabb=(-1, -1, -1, 1, 1, 1), unbounded=True,
              base_mlp_layer_width=16)
    base = DensityField(**kw)
    skip = DensityField(**kw, fine_level_skip=2, fine_level_frac=0.5)
    x = jax.random.normal(jax.random.PRNGKey(5), (5, 24, 3)) * 2.0
    params = base.init(jax.random.PRNGKey(6), x)
    d_base = base.apply(params, x)
    d_skip = skip.apply(params, x)
    assert d_skip.shape == d_base.shape
    # frac 0.5 of 24 = 12, snapped DOWN to the sublane tile -> 8
    s_near = 8
    np.testing.assert_array_equal(
        np.asarray(d_skip[:, :s_near]), np.asarray(d_base[:, :s_near])
    )
    assert bool(jnp.isfinite(d_skip).all())
    # far segment really is different (fine features zeroed)
    assert float(jnp.abs(d_skip[:, s_near:] - d_base[:, s_near:]).max()) > 0

    # gradients flow through both segments
    def loss(p):
        return (skip.apply(p, x) ** 2).sum()

    grads = jax.grad(loss)(params)
    gt = grads["params"]["hash_table"]
    assert bool(jnp.isfinite(gt).all())
    assert float(jnp.abs(gt).max()) > 0


@pytest.mark.slow
def test_density_field_skip_flagship_step_runs():
    """Tiny flagship train step compiles + runs with prop fine-level
    skipping enabled via config.  Slow tier: builds the full train step
    (~85 s CPU); the default tier covers the same path via the
    DensityField-level tests above."""
    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship
    from emernerf_tpu.train.step import build_train_step, init_train_state

    cfg, dataset, model, props, step_cfg = build_flagship(
        tiny=True, overrides=["nerf.propnet.fine_level_skip=1",
                              "nerf.propnet.fine_level_frac=0.5",
                              # tiny default [8,4] is too small for a
                              # near/far split (the knob now ERRORS when
                              # it cannot engage); 16 samples -> s_near=8
                              "nerf.propnet.num_samples_per_prop=[16,16]",
                              # the prop field is also queried at the
                              # final samples (prop supervision); keep
                              # every query > the 8-sample split floor
                              "nerf.sampling.num_samples=16"])
    assert props[0].fine_level_skip == 1
    # prove the knob ENGAGES at this shape (round-4 review: the old tiny
    # shape compiled a step where the skip path never ran): the skipped
    # field must differ from an unskipped clone on sorted samples
    import dataclasses as _dc

    x_sorted = jnp.sort(
        jax.random.normal(jax.random.PRNGKey(1), (4, 16, 3)), axis=-2
    )
    p0 = props[0].init(jax.random.PRNGKey(2), x_sorted)
    # fresh tables init near zero (both paths would trivially agree);
    # randomize so zeroed fine features are visible
    p0 = jax.tree.map(
        lambda t: jax.random.normal(jax.random.PRNGKey(3), t.shape, t.dtype),
        p0,
    )
    noskip = _dc.replace(props[0], fine_level_skip=0) if _dc.is_dataclass(
        props[0]) else props[0].clone(fine_level_skip=0)
    d_skip = props[0].apply(p0, x_sorted)
    d_full = noskip.apply(p0, x_sorted)
    assert float(jnp.abs(d_skip - d_full).max()) > 0
    scene = dataset.scene_tensors()
    key = jax.random.PRNGKey(0)
    pixel = sample_pixel_batch(scene, key, cfg.data.ray_batch_size,
                               use_timestamps=True)
    lidar = sample_lidar_batch(scene, key, cfg.data.ray_batch_size)
    state = init_train_state(model, props, step_cfg, key, pixel)
    step = build_train_step(model, props, step_cfg)
    state, m = step(state, pixel, lidar, key, pixel_rg=True, lidar_rg=True)
    assert bool(jnp.isfinite(m["psnr"]))


def test_fine_level_skip_misconfig_errors():
    """fine_level_skip must ERROR on misconfiguration, never silently
    no-op (a quality gate must not pass because the knob never engaged)."""
    import dataclasses

    from emernerf_tpu.builders import build_propnets_from_cfg
    from emernerf_tpu.flagship import flagship_config
    from emernerf_tpu.models.fields import DensityField

    class _FakeDS:
        aabb = np.array([-1, -1, -1, 1, 1, 1], np.float32)

    # non-brick backend: hard error at build time
    cfg = flagship_config(tiny=True, overrides=[
        "nerf.model.grid_backend=hash", "nerf.propnet.fine_level_skip=1"])
    with pytest.raises(ValueError, match="grid_backend=brick"):
        build_propnets_from_cfg(cfg, _FakeDS())

    # skip >= n_levels: hard error at build time (tiny props have 2 levels)
    cfg = flagship_config(tiny=True, overrides=[
        "nerf.propnet.fine_level_skip=2"])
    with pytest.raises(ValueError, match="must be < the prop"):
        build_propnets_from_cfg(cfg, _FakeDS())

    # direct-API misuse errors at trace time too
    df = DensityField(spec=SPEC3, aabb=(-1, -1, -1, 1, 1, 1),
                      fine_level_skip=SPEC3.n_levels)
    with pytest.raises(ValueError, match="must be < n_levels"):
        df.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 3)))

    # too few samples for a near/far split: errors instead of silently
    # falling back to a full encode (round-4 review finding)
    df = DensityField(spec=SPEC3, aabb=(-1, -1, -1, 1, 1, 1),
                      fine_level_skip=1)
    with pytest.raises(ValueError, match="cannot engage"):
        df.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 3)))

    # 4D spec (has_time) rejected (positions stay (.., 3): the check
    # fires before any encode)
    df4 = DensityField(spec=SPEC4, aabb=(-1, -1, -1, 1, 1, 1),
                       fine_level_skip=1)
    with pytest.raises(ValueError, match="3D brick-grid"):
        df4.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 3)))
