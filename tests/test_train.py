"""End-to-end training tests on the analytic synthetic scene."""

from dataclasses import replace as dataclasses_replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emernerf_tpu.data.scene import (
    SceneTensors,
    sample_lidar_batch,
    sample_pixel_batch,
    update_pixel_error_map,
)
from emernerf_tpu.data.synthetic import make_synthetic_scene
from emernerf_tpu.models.fields import DensityField, RadianceField
from emernerf_tpu.ops.hashgrid import HashGridSpec
from emernerf_tpu.render.prop_sampler import proposal_requires_grad_schedule
from emernerf_tpu.train.optim import chained_lr_schedule
from emernerf_tpu.train.step import TrainStepConfig, build_train_step, init_train_state

HW = (24, 32)


def _make_scene(dynamic=False):
    s = make_synthetic_scene(num_frames=4, hw=HW, dynamic=dynamic,
                             num_lidar_rays_per_frame=256)
    n = s["images"].shape[0]
    return s, SceneTensors(
        images=jnp.asarray(s["images"]),
        c2w=jnp.asarray(s["c2w"]),
        intrinsics=jnp.asarray(s["intrinsics"]),
        normed_timestamps=jnp.asarray(s["normed_timestamps"]),
        cam_ids=jnp.asarray(s["cam_ids"]),
        train_indices=jnp.arange(n, dtype=jnp.int32),
        sky_masks=jnp.asarray(s["sky_masks"]),
        lidar_origins=jnp.asarray(s["lidar_origins"]),
        lidar_viewdirs=jnp.asarray(s["lidar_viewdirs"]),
        lidar_ranges=jnp.asarray(s["lidar_ranges"]),
        lidar_normed_timestamps=jnp.asarray(s["lidar_normed_timestamps"]),
        aabb=jnp.asarray(s["aabb"]),
    )


def _make_models(scene_np, dynamic=False, flow=False):
    aabb = tuple(float(v) for v in scene_np["aabb"])
    spec3 = HashGridSpec(3, 6, 8, 256, 14, 2)
    spec4 = HashGridSpec(4, 6, 8, 128, 13, 2)
    model = RadianceField(
        static_spec=spec3,
        dynamic_spec=spec4 if dynamic else None,
        flow_spec=spec4 if flow else None,
        aabb=aabb,
        geometry_feature_dim=16,
        base_mlp_layer_width=32,
        head_mlp_layer_width=32,
        semantic_feature_dim=0,
        enable_img_embedding=True,
        num_train_timesteps=scene_np["num_frames"],
        num_cams=scene_np["num_cams"],
        appearance_embedding_dim=4,
        enable_sky_head=True,
        time_diff=scene_np["time_diff"],
    )
    prop = DensityField(
        spec=HashGridSpec(3, 4, 8, 128, 14, 1), aabb=aabb,
        base_mlp_layer_width=32,
    )
    return model, [prop]


def test_lr_schedule_matches_torch_chained():
    lr_fn = chained_lr_schedule(0.01, 25000)
    # warmup start: factor 0.01
    assert np.isclose(float(lr_fn(0)), 1e-4, rtol=1e-4)
    # end of warmup (2500 scheduler steps)
    assert np.isclose(float(lr_fn(2500)), 0.01, rtol=1e-4)
    # after first milestone (num_iters//4 scheduler steps)
    assert np.isclose(float(lr_fn(7000)), 0.01 * 0.33, rtol=1e-4)
    assert np.isclose(float(lr_fn(13000)), 0.01 * 0.33**2, rtol=1e-4)
    assert np.isclose(float(lr_fn(24000)), 0.01 * 0.33**4, rtol=1e-4)


def test_sampling_batches():
    scene_np, scene = _make_scene()
    key = jax.random.PRNGKey(0)
    batch = sample_pixel_batch(scene, key, 128)
    assert batch["origins"].shape == (128, 3)
    assert batch["pixels"].shape == (128, 3)
    assert batch["sky_masks"].shape == (128,)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(batch["viewdirs"]), axis=-1), 1.0, atol=1e-4
    )
    lbatch = sample_lidar_batch(scene, key, 64)
    assert lbatch["ranges"].shape == (64,)
    assert bool(jnp.all(lbatch["ranges"] > 0))


def test_importance_sampling_prefers_high_error():
    scene_np, scene = _make_scene()
    n, h, w = scene.images.shape[:3]
    bd = 4
    err = jnp.full((n, h // bd, w // bd), 1e-6)
    err = err.at[2].set(1.0)  # all error concentrated in image 2
    scene = scene.replace(pixel_error_map=err)
    # ask for fewer roi rays (32) than high-error buffer entries (48):
    # sampling is without replacement, like torch.multinomial
    batch = sample_pixel_batch(scene, jax.random.PRNGKey(0), 64,
                               buffer_ratio=0.5, buffer_downscale=bd)
    roi_imgs = np.asarray(batch["img_idx"][32:])
    assert (roi_imgs == 2).mean() > 0.9


def test_update_pixel_error_map():
    scene_np, scene = _make_scene()
    pred = jnp.zeros_like(scene.images[:, ::4, ::4])
    gt = scene.images[:, ::4, ::4]
    scene2 = update_pixel_error_map(scene, pred, gt)
    assert scene2.pixel_error_map.shape == gt.shape[:3]
    assert float(scene2.pixel_error_map.max()) == 1.0


@pytest.mark.slow
@pytest.mark.parametrize("dynamic,flow", [(False, False), (True, True)])
def test_training_improves_psnr(dynamic, flow):
    scene_np, scene = _make_scene(dynamic=dynamic)
    model, props = _make_models(scene_np, dynamic=dynamic, flow=flow)
    cfg = TrainStepConfig(
        num_samples=16,
        prop_samples=(24,),
        use_sky_loss=True,
        has_lidar=True,
        has_flow=flow,
        use_dynamic_reg=dynamic,
        num_iters=2000,
        los_enable=True,
        los_start_iter=50,
        depth_upper_bound=80.0,
        lr=0.01,
    )
    key = jax.random.PRNGKey(0)
    pixel_batch = sample_pixel_batch(scene, key, 256)
    state = init_train_state(model, props, cfg, key, pixel_batch)
    step_fn = build_train_step(model, props, cfg)
    rg_fn = proposal_requires_grad_schedule()

    sample_p = jax.jit(partial(sample_pixel_batch, num_rays=256))
    sample_l = jax.jit(partial(sample_lidar_batch, num_rays=256))

    psnrs = []
    for i in range(60):
        key, k1, k2, k3 = jax.random.split(key, 4)
        pb = sample_p(scene, k1)
        lb = sample_l(scene, k2)
        state, metrics = step_fn(
            state, pb, lb, k3, pixel_rg=rg_fn(i), lidar_rg=rg_fn(i)
        )
        psnrs.append(float(metrics["psnr"]))

    early = np.mean(psnrs[:5])
    late = np.mean(psnrs[-5:])
    assert late > early + 2.0, f"PSNR did not improve: {early:.2f} -> {late:.2f}"
    assert np.isfinite(psnrs).all()


@pytest.mark.slow
def test_fused_topk_quality_parity():
    """The TPU-production formulation (fused dyn+flow brick grid +
    top-K temporal aggregation) must train the synthetic dynamic scene to
    within 0.5 dB of the reference-semantics formulation (separate hash
    grids, aggregation on every sample)."""
    from emernerf_tpu.ops.brickgrid import BrickGridSpec

    scene_np, scene = _make_scene(dynamic=True)
    aabb = tuple(float(v) for v in scene_np["aabb"])

    def run(variant):
        if variant == "reference":
            spec3 = HashGridSpec(3, 6, 8, 256, 14, 2)
            spec4 = HashGridSpec(4, 6, 8, 128, 13, 2)
            extra = {}
            pspec = HashGridSpec(3, 4, 8, 128, 14, 1)
        else:
            spec3 = BrickGridSpec(3, 6, 8, 256, 11, 2)
            spec4 = BrickGridSpec(4, 6, 8, 128, 10, 2, time_pair=True)
            extra = dict(
                fuse_flow_grid=True,
                temporal_agg_topk=4 if variant == "topk" else 0,
            )
            pspec = BrickGridSpec(3, 4, 8, 128, 11, 1)
        model = RadianceField(
            static_spec=spec3, dynamic_spec=spec4, flow_spec=spec4,
            aabb=aabb, geometry_feature_dim=16, base_mlp_layer_width=32,
            head_mlp_layer_width=32, semantic_feature_dim=0,
            enable_img_embedding=True,
            num_train_timesteps=scene_np["num_frames"],
            num_cams=scene_np["num_cams"], appearance_embedding_dim=4,
            enable_sky_head=True, time_diff=scene_np["time_diff"], **extra,
        )
        props = [DensityField(spec=pspec, aabb=aabb, base_mlp_layer_width=32)]
        cfg = TrainStepConfig(
            num_samples=16, prop_samples=(24,), use_sky_loss=True,
            has_lidar=True, has_flow=True, use_dynamic_reg=True,
            num_iters=2000, los_enable=True, los_start_iter=50, lr=0.01,
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
        assert np.isfinite(psnrs).all()
        return np.mean(psnrs[-5:])

    psnr_ref = run("reference")
    psnr_fused = run("fused")
    psnr_topk = run("topk")
    print(f"\n[parity] ref={psnr_ref:.3f} fused={psnr_fused:.3f} "
          f"topk={psnr_topk:.3f}")
    # measured: fused -0.08 dB, topk -0.11 dB vs reference semantics at
    # this scale (gate was 1.5 dB in round 1, 0.5 in round 2; now at the
    # VERDICT #2 0.3 target — flagship evidence in perf/QUALITY_r02.json)
    assert psnr_fused > psnr_ref - 0.3, (
        f"fused grid quality gap: {psnr_fused:.2f} vs {psnr_ref:.2f}"
    )
    assert psnr_topk > psnr_ref - 0.3, (
        f"top-k aggregation quality gap: {psnr_topk:.2f} vs {psnr_ref:.2f}"
    )


def test_staged_lidar_topk_schedule():
    """Staged lidar-K (VERDICT r2 #5): lidar_full_at flips at
    lidar_topk_until * num_iters (pure host logic, no jit)."""
    from emernerf_tpu.train.step import lidar_full_at

    cfg = TrainStepConfig(num_samples=8, prop_samples=(16,), has_lidar=True,
                          sample_topk=4, sample_topk_temp=0.0,
                          lidar_sample_topk=4, lidar_topk_until=0.9,
                          num_iters=100, use_sky_loss=False)
    assert not lidar_full_at(cfg, 0)
    assert not lidar_full_at(cfg, 89)
    assert lidar_full_at(cfg, 90) and lidar_full_at(cfg, 99)
    # inactive when staging is off or there is nothing to unprune
    assert not lidar_full_at(
        dataclasses_replace(cfg, lidar_topk_until=1.0), 99)
    assert not lidar_full_at(
        dataclasses_replace(cfg, sample_topk=0, lidar_sample_topk=0), 99)


@pytest.mark.slow
def test_staged_lidar_topk_both_variants_execute():
    """Both compiled step variants (pruned / full lidar shading) run and
    advance the state."""
    cfg = TrainStepConfig(num_samples=8, prop_samples=(16,), has_lidar=True,
                          sample_topk=4, sample_topk_temp=0.0,
                          lidar_sample_topk=4, lidar_topk_until=0.9,
                          num_iters=100, use_sky_loss=False)
    scene_np, scene = _make_scene()
    model, props = _make_models(scene_np)
    key = jax.random.PRNGKey(0)
    pb = sample_pixel_batch(scene, key, 64)
    lb = sample_lidar_batch(scene, key, 64)
    state = init_train_state(model, props, cfg, key, pb)
    step_fn = build_train_step(model, props, cfg)
    state, m0 = step_fn(state, pb, lb, key, pixel_rg=True, lidar_rg=True,
                        lidar_full=False)
    state, m1 = step_fn(state, pb, lb, key, pixel_rg=True, lidar_rg=True,
                        lidar_full=True)
    assert int(state.step) == 2
    assert np.isfinite(float(m0["range_rmse"]))
    assert np.isfinite(float(m1["range_rmse"]))


def test_staged_lidar_topk_rejected_with_fused_branches():
    scene_np, scene = _make_scene()
    model, props = _make_models(scene_np)
    cfg = TrainStepConfig(num_samples=8, prop_samples=(16,), has_lidar=True,
                          fused_branches=True, lidar_topk_until=0.9,
                          sample_topk=4, use_sky_loss=False, num_iters=100)
    with pytest.raises(ValueError, match="lidar_topk_until"):
        build_train_step(model, props, cfg)
    cfg2 = TrainStepConfig(num_samples=8, prop_samples=(16,), has_lidar=True,
                           fused_branches=True, lidar_prop_samples=(8,),
                           use_sky_loss=False, num_iters=100)
    with pytest.raises(ValueError, match="lidar_prop_samples"):
        build_train_step(model, props, cfg2)


def test_fused_branch_on_default_config_normalizes_staged_k():
    """ADVICE r3 #2: optim.fused_lidar_branch=true on an otherwise-default
    config must NOT hard-error on the (default-on since r3) staged lidar-K
    knob the user never touched — load_config normalizes the DEFAULT
    lidar_topk_until to 1.0; an explicit user setting of both still
    conflicts at build_train_step."""
    import os as _os

    from emernerf_tpu.config import load_config

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    default = _os.path.join(root, "configs", "default_config.yaml")
    assert load_config(default).nerf.sampling.lidar_topk_until == 0.9
    cfg = load_config(default, dotlist=["optim.fused_lidar_branch=true"])
    assert cfg.nerf.sampling.lidar_topk_until == 1.0
    cfg = load_config(default, dotlist=["optim.fused_lidar_branch=true",
                                        "nerf.sampling.lidar_topk_until=0.8"])
    assert cfg.nerf.sampling.lidar_topk_until == 0.8  # explicit: kept

    # the OTHER override entry point (round-4 review: flagship_config
    # merges overrides AFTER load_config, bypassing a load_config-only
    # normalization) must normalize too
    from emernerf_tpu.flagship import flagship_config

    fcfg = flagship_config(overrides=["optim.fused_lidar_branch=true"])
    assert fcfg.nerf.sampling.lidar_topk_until == 1.0
    fcfg = flagship_config(overrides=["optim.fused_lidar_branch=true",
                                      "nerf.sampling.lidar_topk_until=0.8"])
    assert fcfg.nerf.sampling.lidar_topk_until == 0.8


def test_lidar_prop_samples_config_roundtrip():
    """configs nerf.propnet.lidar_num_samples_per_prop reaches
    TrainStepConfig.lidar_prop_samples (None when unset — the default)."""
    from emernerf_tpu.flagship import build_flagship

    _, _, _, _, step_cfg = build_flagship(tiny=True)
    assert step_cfg.lidar_prop_samples is None
    _, _, _, _, step_cfg = build_flagship(
        tiny=True,
        overrides=["nerf.propnet.lidar_num_samples_per_prop=[4,2]"],
    )
    assert step_cfg.lidar_prop_samples == (4, 2)


@pytest.mark.slow
def test_train_state_step_advances_and_lr_logged():
    scene_np, scene = _make_scene()
    model, props = _make_models(scene_np)
    cfg = TrainStepConfig(num_samples=8, prop_samples=(16,), has_lidar=False,
                          use_sky_loss=False, num_iters=100)
    key = jax.random.PRNGKey(0)
    pb = sample_pixel_batch(scene, key, 64)
    state = init_train_state(model, props, cfg, key, pb)
    step_fn = build_train_step(model, props, cfg)
    state, metrics = step_fn(state, pb, None, key, pixel_rg=True, lidar_rg=False)
    assert int(state.step) == 1
    assert "lr" in metrics and float(metrics["lr"]) > 0
    assert "prop_loss" in metrics


@pytest.mark.slow
def test_fused_branch_step_matches_metric_surface():
    """fused_branches=True: one combined pixel+lidar render/backward/update
    produces the same metric keys, finite values, and an advancing step."""
    scene_np, scene = _make_scene()
    model, props = _make_models(scene_np)
    common = dict(num_samples=8, prop_samples=(16,), has_lidar=True,
                  use_sky_loss=True, los_enable=True, los_start_iter=0,
                  num_iters=100)
    key = jax.random.PRNGKey(0)
    pb = sample_pixel_batch(scene, key, 64)
    lb = sample_lidar_batch(scene, key, 64)

    metrics = {}
    for fused in (False, True):
        cfg = TrainStepConfig(fused_branches=fused, **common)
        state = init_train_state(model, props, cfg, key, pb)
        step_fn = build_train_step(model, props, cfg)
        state, m = step_fn(state, pb, lb, key, pixel_rg=True, lidar_rg=True)
        assert int(state.step) == 1
        vals = np.array([float(v) for v in m.values()])
        assert np.isfinite(vals).all()
        metrics[fused] = m
    assert set(metrics[True]) == set(metrics[False])
    # same data, same init: the two formulations see identical forward
    # renders in their first step, so the pixel loss agrees
    np.testing.assert_allclose(
        float(metrics[True]["rgb_loss"]), float(metrics[False]["rgb_loss"]),
        rtol=2e-2,
    )


def test_nan_tripwire_unit():
    """raise_on_nonfinite flags NaN/inf loss scalars and passes finite ones
    (reference semantics: /root/reference/loss/base.py:77-79)."""
    from emernerf_tpu.train.trainer import raise_on_nonfinite

    raise_on_nonfinite({"rgb_loss": 0.5, "psnr": 20.0, "lr": 0.01}, 100)
    # non-loss keys are not checked even if non-finite (e.g. padded metrics)
    raise_on_nonfinite({"rgb_loss": 1.0, "range_rmse": float("nan")}, 1)
    with pytest.raises(RuntimeError, match="rgb_loss"):
        raise_on_nonfinite({"rgb_loss": float("nan")}, 3)
    with pytest.raises(RuntimeError, match="psnr"):
        raise_on_nonfinite({"psnr": float("inf")}, 3)


@pytest.mark.slow
def test_nan_tripwire_halts_training(tmp_path, monkeypatch):
    """A training run with optim.check_nan=True halts when the fused step
    starts producing non-finite losses."""
    from emernerf_tpu.flagship import flagship_config
    from emernerf_tpu.train.trainer import Trainer

    cfg = flagship_config(
        tiny=True,
        overrides=[
            "optim.num_iters=5",
            "optim.check_nan=true",
            "logging.print_freq=1",
            "logging.saveckpt_freq=0",
            "render.render_low_res=false",
            "render.render_full=false",
            "render.render_test=false",
        ],
    )
    trainer = Trainer(cfg, str(tmp_path))

    real_step = trainer.train_step

    def poisoned_step(state, pixel_batch, lidar_batch, key, **kw):
        new_state, m = real_step(state, pixel_batch, lidar_batch, key, **kw)
        m = dict(m)
        m["rgb_loss"] = jnp.asarray(float("nan"))
        return new_state, m

    monkeypatch.setattr(trainer, "train_step", poisoned_step)
    with pytest.raises(RuntimeError, match="Non-finite loss"):
        trainer.train()


@pytest.mark.slow
def test_adam_moment_dtypes_and_fp32_master_retention():
    """Big fp32 table params get bf16 Adam moments (HBM bound); small
    params keep fp32 moments.  fp32 master params retain updates that
    bf16 storage would round away (round-1 ADVICE.md late-lr stall)."""
    import jax.numpy as jnp

    from emernerf_tpu.train.optim import apply_update, make_adam

    tx = make_adam(0.0)
    params = {
        "table": jnp.full((1 << 20, 2), 0.5, jnp.float32),
        "mlp": jnp.full((8, 8), 0.5, jnp.float32),
    }
    st = tx.init(params)
    assert st[1].mu["table"].dtype == jnp.bfloat16
    assert st[1].nu["table"].dtype == jnp.bfloat16
    assert st[1].mu["mlp"].dtype == jnp.float32

    grads = jax.tree.map(jnp.ones_like, params)
    # lr far below the bf16 ulp of 0.5 (~2^-9): the fp32 add must keep it
    new_params, _ = apply_update(tx, grads, st, params, lr=1e-5)
    delta = float(jnp.abs(new_params["table"] - params["table"]).max())
    assert delta > 0.0
    # and the same value round-tripped through bf16 storage would stall
    assert float(
        jnp.abs(
            new_params["table"].astype(jnp.bfloat16).astype(jnp.float32)
            - params["table"]
        ).max()
    ) == 0.0


def test_wandb_init_retries_then_succeeds(monkeypatch):
    """Flaky wandb.init is retried up to 10 times (reference
    train_emernerf.py:146-157) and degrades to None when always failing."""
    import sys
    import types

    from emernerf_tpu.config import from_dotlist
    from emernerf_tpu.train import trainer as trainer_mod

    calls = {"n": 0}

    def flaky_init(**kwargs):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")

    fake = types.ModuleType("wandb")
    fake.init = flaky_init
    monkeypatch.setitem(sys.modules, "wandb", fake)
    cfg = from_dotlist(["project=test"])
    got = trainer_mod.init_wandb(cfg, "/tmp", retries=10, sleep_s=0.0)
    assert got is fake and calls["n"] == 3

    calls["n"] = 0

    def always_fail(**kwargs):
        calls["n"] += 1
        raise ConnectionError("down")

    fake.init = always_fail
    got = trainer_mod.init_wandb(cfg, "/tmp", retries=4, sleep_s=0.0)
    assert got is None and calls["n"] == 4


def test_log_every_reports_wall_clock_under_async_dispatch(tmp_path):
    """The printed/dumped per-step time must be wall clock between prints,
    not the per-loop dispatch average (VERDICT r4 weak #2: 19 async
    dispatches at ~0 s + one 0.2 s blocking fetch must report ~0.01 s/step,
    not the ~0.01 s-vs-0.2 s window average)."""
    import json as _json
    import time as _time

    from emernerf_tpu.utils.logging import MetricLogger

    out = tmp_path / "metrics.json"
    ml = MetricLogger(output_file=str(out))
    n, print_freq, fetch_sleep = 40, 20, 0.2

    t0 = _time.time()
    for i in ml.log_every(list(range(n)), print_freq):
        # emulate async dispatch: free until a print step forces a fetch
        if i % print_freq == print_freq - 1:
            _time.sleep(fetch_sleep)
    wall_per_step = (_time.time() - t0) / n

    records = [_json.loads(l) for l in out.read_text().splitlines()]
    assert records, "no metric records written"
    # the record at i=20 covers steps 1..20 (one fetch): ~0.01 s/step wall
    rec = next(r for r in records if r["iteration"] == 20)
    assert rec["iter_time"] == pytest.approx(wall_per_step, rel=0.5)
    # and must NOT be the poisoned window average: with a window of
    # [19 fast, 1 slow] the old meter reported ~fetch_sleep/2-ish values
    assert rec["iter_time"] < fetch_sleep / 2
    # the dispatch-side measure is still recorded, separately
    assert "dispatch_time" in rec


@pytest.mark.slow
def test_preemption_saves_checkpoint_and_exits_cleanly(tmp_path, monkeypatch):
    """Graceful preemption (trainer.py, optim.checkpoint_on_preempt): the
    first SIGTERM makes the train loop finish the in-flight step, save
    checkpoint_{step}, restore the previous signal handlers, and return
    normally — so a preempted TPU job can resume_from / --eval_only with
    nothing lost.  No reference analogue (the reference dies mid-step)."""
    import os
    import signal as _signal

    from emernerf_tpu.flagship import flagship_config
    from emernerf_tpu.train.trainer import Trainer

    cfg = flagship_config(
        tiny=True,
        overrides=[
            "optim.num_iters=50",
            "logging.print_freq=10",
            "logging.saveckpt_freq=0",
            "render.render_low_res=false",
            "render.render_full=false",
            "render.render_test=false",
        ],
    )
    trainer = Trainer(cfg, str(tmp_path))
    real_step = trainer.train_step

    def signaling_step(state, pixel_batch, lidar_batch, key, **kw):
        # read BEFORE the call: the fused step donates the input state
        pre_step = int(state.step)
        out = real_step(state, pixel_batch, lidar_batch, key, **kw)
        if pre_step == 3:  # pre-increment step: fires during step 4
            os.kill(os.getpid(), _signal.SIGTERM)
        return out

    monkeypatch.setattr(trainer, "train_step", signaling_step)
    state = trainer.train()  # must return, not die
    assert trainer.preempted is True
    stopped = int(state.step)
    assert 3 < stopped < 50, f"expected an early stop, got step {stopped}"
    ckpts = sorted(tmp_path.glob("checkpoint_*"))
    assert ckpts, "preemption checkpoint missing"
    assert ckpts[-1].name == f"checkpoint_{stopped:05d}"
    # handler restored on first receipt: ours is gone from the signal table
    assert (
        getattr(_signal.getsignal(_signal.SIGTERM), "__name__", "")
        != "_request_stop"
    )
