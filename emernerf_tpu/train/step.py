"""The fused training step.

TPU-first restructuring of the reference train loop body
(/root/reference/train_emernerf.py:612-827).  The reference runs, per
iteration: a pixel-ray render + 7 losses + backward + Adam step, a proposal
-network update with its own optimizer, then a lidar-ray render + depth
losses + a second Adam step.  Here the whole iteration is ONE jitted
function with donated state:

  pixel branch:  grads of (pixel losses + interlevel loss) wrt
                 (model params, prop params) in a single backward
  prop update:   applied only on requires-grad steps (the reference skips
                 optimizer.step() otherwise, which matters for Adam moments)
  model update:  Adam direction scaled by the chained schedule at count 2*step
  lidar branch:  same on the updated params, schedule count 2*step + 1

``proposal_requires_grad`` flags are static, mirroring the host-side
schedule (nerfacc_prop_net.py:280-296); jit caches the few variants.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from emernerf_tpu.losses.losses import (
    cycle_consistency_loss,
    depth_loss,
    dynamic_regularization_loss,
    line_of_sight_loss,
    real_value_loss,
    sky_loss_opacity,
    sky_loss_weights,
)
from emernerf_tpu.render.prop_sampler import compute_prop_loss
from emernerf_tpu.render.renderer import render_ray_batch
from emernerf_tpu.train.optim import apply_update, chained_lr_schedule, make_adam
from emernerf_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    """Static hyperparameters of one training step (hashable for jit).

    Defaults mirror /root/reference/configs/default_config.yaml.
    """

    # sampling (default_config.yaml:44-60)
    num_samples: int = 64
    prop_samples: Tuple[int, ...] = (128, 64)
    near_plane: float = 0.1
    far_plane: float = 1000.0
    sampling_type: str = "uniform_lindisp"
    enable_anti_aliasing: bool = True
    pulse_widths: Tuple[float, ...] = (0.03, 0.003)
    prop_loss_scaler: float = 1024.0
    # supervision (default_config.yaml:116-150)
    rgb_loss_type: str = "l2"
    rgb_coef: float = 1.0
    use_sky_loss: bool = False
    sky_loss_type: str = "opacity_based"
    sky_coef: float = 0.001
    use_feature_loss: bool = False
    feature_loss_type: str = "l2"
    feature_coef: float = 0.5
    use_dynamic_reg: bool = False
    dynamic_loss_type: str = "sparsity"
    dynamic_coef: float = 0.01
    entropy_skewness: float = 1.1
    use_shadow_loss: bool = False
    shadow_loss_type: str = "sparsity"
    shadow_coef: float = 0.01
    cycle_coef: float = 0.01
    has_flow: bool = False
    # lidar supervision
    has_lidar: bool = False
    depth_loss_type: str = "l2"
    depth_coef: float = 1.0
    depth_upper_bound: float = 80.0
    los_enable: bool = True
    los_coef: float = 0.1
    los_start_iter: int = 2000
    los_start_epsilon: float = 6.0
    los_end_epsilon: float = 2.5
    los_decay_steps: int = 5000
    los_decay_rate: float = 0.5
    # optimization (default_config.yaml:151-155)
    lr: float = 0.01
    weight_decay: float = 1e-5
    num_iters: int = 25000
    # recompute field queries in the backward (jax.checkpoint) instead of
    # holding every head's activations; EMERNERF_REMAT=1 env overrides
    remat: bool = False
    # TPU restructuring: render the pixel and lidar ray batches as ONE
    # combined batch with a single backward + Adam update per iteration
    # (the reference runs two sequential backward/update passes,
    # train_emernerf.py:741-826).  Halves per-op fixed costs and doubles
    # the row count every gather/scatter amortizes over.  PSNR parity with
    # the two-pass formulation is asserted by tests/test_train.py.
    fused_branches: bool = False
    # TPU-native empty-space skipping: evaluate the radiance field on only
    # the top-K samples per ray ranked by the last proposal net's predicted
    # contribution (render/renderer.py:_topk_sample_select), scattering
    # outputs back to full (R, S).  The CUDA reference gets the same row
    # reduction from nerfacc's occupancy-grid skip + early termination
    # (dynamic shapes; impossible under XLA).  0 disables.
    sample_topk: int = 0
    # Gumbel temperature on the selection scores (>0 keeps pruned regions
    # reachable by gradients, like nerfacc's periodic occupancy refresh)
    sample_topk_temp: float = 0.0
    # separate (typically more aggressive) top-K for the density-only
    # lidar branch: depth + line-of-sight supervision concentrates near
    # the lidar return, which is exactly what the proposal proxy ranks
    # highest, so the lidar render tolerates a smaller K than the RGB
    # branch.  -1 = use ``sample_topk``.  Ignored by ``fused_branches``
    # (one combined render can only have one K).
    lidar_sample_topk: int = -1
    # staged lidar-K (VERDICT r2 #5): fraction of the schedule after which
    # the lidar branch renders UNPRUNED (sample_topk=0).  Constant K=16
    # prunes the far tail of every lidar ray for the whole run and ends
    # 2500 steps with ~2x the range RMSE of the unpruned baseline; giving
    # the last (1 - lidar_topk_until) of the schedule the full 64 samples
    # recovers the final depth accuracy at ~the pruned wall rate.  The
    # switch is a second compiled step variant selected by the host loop
    # (static ``lidar_full`` arg), exactly like the rg schedule.  1.0 =
    # never switch (constant K).
    lidar_topk_until: float = 1.0
    # per-branch proposal sample counts for the lidar branch (e.g.
    # (64, 32)): the density-only branch needs the proposal hierarchy only
    # to localize the single lidar return, so it tolerates coarser
    # proposals than the RGB branch — halving cuts ~1/6 of the step's
    # prop-grid gather/scatter rows (PERF_NOTES round-3 queue #2).
    # None = use ``prop_samples``.  Ignored by ``fused_branches``.
    lidar_prop_samples: Optional[Tuple[int, ...]] = None


def _psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def _los_epsilon(cfg: TrainStepConfig, step):
    """Linear epsilon decay from start to end over the remaining schedule
    (train_emernerf.py:780-793)."""
    m = (cfg.los_end_epsilon - cfg.los_start_epsilon) / max(
        cfg.num_iters - cfg.los_start_iter, 1
    )
    b = cfg.los_start_epsilon - m * cfg.los_start_iter
    eps = m * jnp.asarray(step, jnp.float32) + b
    return jnp.clip(
        eps,
        min(cfg.los_start_epsilon, cfg.los_end_epsilon),
        max(cfg.los_start_epsilon, cfg.los_end_epsilon),
    )


def _los_decay_weight(cfg: TrainStepConfig, step):
    """Stepwise coef decay: *= decay_rate every decay_steps past start_iter
    (train_emernerf.py:620-628)."""
    past = jnp.maximum(jnp.asarray(step, jnp.int32) - cfg.los_start_iter, 0)
    n = past // cfg.los_decay_steps
    return cfg.los_decay_rate ** n.astype(jnp.float32)


def build_train_step(
    model,
    prop_models: Sequence,
    cfg: TrainStepConfig,
    mesh=None,
    spmd=None,
):
    """Returns jitted ``train_step(state, pixel_batch, lidar_batch, key,
    pixel_rg, lidar_rg) -> (new_state, metrics)``.

    Batches are dicts of statically-shaped device arrays:
      pixel: origins, viewdirs, pixels, + optional sky_masks, features,
             normed_timestamps, img_idx, cam_idx, pixel_coords
      lidar: origins, viewdirs, ranges, normed_timestamps

    With ``mesh`` the step runs under ``shard_map`` over the data axis with
    EXPLICIT collectives per ``spmd`` (parallel/spmd.py): bf16 gradient
    psum and optionally ZeRO (reduce-scattered big-table grads + sharded
    Adam moments).  ``mesh=None`` keeps the single-program path (the
    implicit-SPMD wrapper in parallel/mesh.py still works on top of it).
    """
    tx = make_adam(cfg.weight_decay)
    lr_fn = chained_lr_schedule(cfg.lr, cfg.num_iters)
    steps_per_iter = 2 if cfg.has_lidar else 1

    n_shards = 1
    if mesh is not None:
        from emernerf_tpu.parallel.spmd import (
            SpmdConfig,
            reduce_grads,
            spmd_apply_update,
        )

        spmd = spmd if spmd is not None else SpmdConfig()
        n_shards = mesh.devices.size

    def _reduce(grads):
        if mesh is None:
            return grads
        return reduce_grads(grads, spmd, n_shards)

    def _apply(grads, opt_state, params, lr):
        if mesh is None:
            return apply_update(tx, grads, opt_state, params, lr)
        return spmd_apply_update(
            grads, opt_state, params, lr, spmd, n_shards, cfg.weight_decay
        )

    def _finalize_metrics(metrics):
        if mesh is None:
            return metrics
        return jax.tree.map(
            lambda v: jax.lax.pmean(v, spmd.axis_name), metrics
        )

    if cfg.fused_branches and cfg.lidar_prop_samples is not None:
        # ADVICE r2: a user enabling both would silently measure nothing
        raise ValueError(
            "lidar_prop_samples has no effect with fused_branches=True "
            "(one combined render has one proposal hierarchy)"
        )
    if cfg.fused_branches and cfg.lidar_topk_until < 1.0:
        raise ValueError(
            "lidar_topk_until (staged lidar-K) has no effect with "
            "fused_branches=True (one combined render has one sample_topk)"
        )

    render_kw = dict(
        num_samples=cfg.num_samples,
        prop_samples=tuple(cfg.prop_samples),
        near_plane=cfg.near_plane,
        far_plane=cfg.far_plane,
        sampling_type=cfg.sampling_type,
        sample_topk=cfg.sample_topk,
        sample_topk_temp=cfg.sample_topk_temp,
    )
    lidar_render_kw = dict(
        render_kw,
        sample_topk=(
            cfg.lidar_sample_topk
            if cfg.lidar_sample_topk >= 0
            else cfg.sample_topk
        ),
        prop_samples=(
            tuple(cfg.lidar_prop_samples)
            if cfg.lidar_prop_samples is not None
            else tuple(cfg.prop_samples)
        ),
    )
    # staged lidar-K end-of-schedule variant: full 64-sample shading
    lidar_render_kw_full = dict(lidar_render_kw, sample_topk=0)

    # ---------------- pixel branch ---------------- #
    def _pixel_losses(out, extras, batch):
        losses: Dict[str, jnp.ndarray] = {
            "rgb_loss": real_value_loss(
                out["rgb"], batch["pixels"], cfg.rgb_loss_type, cfg.rgb_coef
            )
        }
        if cfg.use_sky_loss:
            if cfg.sky_loss_type == "opacity_based":
                losses["sky_loss"] = sky_loss_opacity(
                    out["opacity"], batch["sky_masks"], cfg.sky_coef
                )
            else:
                losses["sky_loss"] = sky_loss_weights(
                    extras["weights"], batch["sky_masks"], cfg.sky_coef
                )
        if cfg.use_feature_loss:
            losses["feature_loss"] = real_value_loss(
                out["dino_feat"], batch["features"], cfg.feature_loss_type,
                cfg.feature_coef,
            )
        if cfg.use_dynamic_reg:
            losses["dynamic_reg_loss"] = dynamic_regularization_loss(
                extras["dynamic_density"], extras["static_density"],
                loss_type=cfg.dynamic_loss_type, coef=cfg.dynamic_coef,
                entropy_skewness=cfg.entropy_skewness,
            )
        if cfg.use_shadow_loss:
            losses["shadow_loss"] = dynamic_regularization_loss(
                out["shadow_ratio"], loss_type=cfg.shadow_loss_type,
                coef=cfg.shadow_coef,
            )
        if cfg.has_flow:
            losses["cycle_loss"] = cycle_consistency_loss(
                extras["forward_flow"], extras["forward_pred_backward_flow"],
                extras["backward_flow"], extras["backward_pred_forward_flow"],
                cfg.cycle_coef, mask=extras.get("agg_mask"),
            )
        return losses

    def pixel_loss_fn(params_tuple, batch, key, agg_key, step, requires_grad):
        params, prop_params = params_tuple
        out, caches, s_vals = render_ray_batch(
            model, params, prop_models, prop_params, batch, key,
            stratified=True, proposal_requires_grad=requires_grad,
            train=True, rngs={"aggregation": agg_key},
            remat=cfg.remat or os.environ.get("EMERNERF_REMAT", "0") == "1",
            **render_kw,
        )
        extras = out["extras"]
        losses = _pixel_losses(out, extras, batch)
        prop_loss = jnp.zeros(())
        if requires_grad:
            prop_loss = compute_prop_loss(
                caches, s_vals, extras["trans"], cfg.enable_anti_aliasing,
                tuple(cfg.pulse_widths), cfg.prop_loss_scaler,
            )
        total = sum(losses.values()) + prop_loss
        aux = dict(losses)
        aux["prop_loss"] = prop_loss
        aux["psnr"] = _psnr(out["rgb"], batch["pixels"])
        aux["total_pixel_loss"] = sum(losses.values())
        return total, aux

    # ---------------- lidar branch ---------------- #
    def _lidar_losses(out, extras, batch, step):
        losses = {
            "lidar_range_loss": depth_loss(
                out["depth"], batch["ranges"], cfg.depth_loss_type,
                cfg.depth_coef, cfg.depth_upper_bound,
            )
        }
        if cfg.los_enable:
            los = line_of_sight_loss(
                batch["ranges"], extras["weights"], extras["t_vals"],
                _los_epsilon(cfg, step), cfg.los_coef,
                _los_decay_weight(cfg, step),
            )
            # active only after the warmup iterations
            losses["lidar_line_of_sight"] = jnp.where(
                step > cfg.los_start_iter, los, 0.0
            )
        if cfg.use_dynamic_reg:
            losses["lidar_dynamic_loss"] = dynamic_regularization_loss(
                extras["dynamic_density"], extras["static_density"],
                loss_type=cfg.dynamic_loss_type, coef=cfg.dynamic_coef,
                entropy_skewness=cfg.entropy_skewness,
            )
        return losses

    def lidar_loss_fn(params_tuple, batch, key, agg_key, step, requires_grad,
                      full=False):
        params, prop_params = params_tuple
        out, caches, s_vals = render_ray_batch(
            model, params, prop_models, prop_params, batch, key,
            stratified=True, proposal_requires_grad=requires_grad,
            is_lidar=True, train=True, rngs={"aggregation": agg_key},
            remat=cfg.remat or os.environ.get("EMERNERF_REMAT", "0") == "1",
            **(lidar_render_kw_full if full else lidar_render_kw),
        )
        extras = out["extras"]
        losses = _lidar_losses(out, extras, batch, step)
        prop_loss = jnp.zeros(())
        if requires_grad:
            prop_loss = compute_prop_loss(
                caches, s_vals, extras["trans"], cfg.enable_anti_aliasing,
                tuple(cfg.pulse_widths), cfg.prop_loss_scaler,
            )
        total = sum(losses.values()) + prop_loss
        aux = dict(losses)
        aux["total_lidar_loss"] = sum(losses.values())
        aux["range_rmse"] = jnp.sqrt(
            jnp.mean((out["depth"][..., 0] - batch["ranges"]) ** 2)
        )
        return total, aux


    # ---------------- fused pixel+lidar branch ---------------- #
    def _combined_batch(pixel_batch, lidar_batch):
        """Concatenate the two ray batches; a side missing a metadata key
        gets neutral values (lidar rays' rgb/feature head outputs are
        discarded by the loss slicing — the fused branch pays that head
        compute for the op merging; see TrainStepConfig.fused_branches).
        The key set is the UNION of both batches, so e.g. a lidar-only
        ``normed_timestamps`` still renders lidar rays as dynamic."""
        rp = pixel_batch["origins"].shape[0]
        rl = lidar_batch["origins"].shape[0]
        comb = {
            "origins": jnp.concatenate(
                [pixel_batch["origins"], lidar_batch["origins"]]
            ),
            "viewdirs": jnp.concatenate(
                [pixel_batch["viewdirs"], lidar_batch["viewdirs"]]
            ),
        }
        for k in ("normed_timestamps", "img_idx", "cam_idx", "pixel_coords"):
            pv, lv = pixel_batch.get(k), lidar_batch.get(k)
            if pv is None and lv is None:
                continue
            if pv is None:
                pv = jnp.zeros((rp,) + lv.shape[1:], lv.dtype)
            if lv is None:
                lv = jnp.zeros((rl,) + pv.shape[1:], pv.dtype)
            comb[k] = jnp.concatenate([pv, lv])
        return comb, rp

    def joint_loss_fn(params_tuple, pixel_batch, lidar_batch, key, agg_key,
                      step, requires_grad):
        params, prop_params = params_tuple
        comb, rp = _combined_batch(pixel_batch, lidar_batch)
        out, caches, s_vals = render_ray_batch(
            model, params, prop_models, prop_params, comb, key,
            stratified=True, proposal_requires_grad=requires_grad,
            train=True, rngs={"aggregation": agg_key},
            remat=cfg.remat or os.environ.get("EMERNERF_REMAT", "0") == "1",
            **render_kw,
        )
        extras = out.pop("extras")
        out_p = jax.tree.map(lambda v: v[:rp], out)
        out_l = jax.tree.map(lambda v: v[rp:], out)
        ex_p = jax.tree.map(lambda v: v[:rp], extras)
        ex_l = jax.tree.map(lambda v: v[rp:], extras)
        losses = _pixel_losses(out_p, ex_p, pixel_batch)
        lidar_losses = _lidar_losses(out_l, ex_l, lidar_batch, step)
        prop_loss = jnp.zeros(())
        if requires_grad:
            prop_loss = compute_prop_loss(
                caches, s_vals, extras["trans"], cfg.enable_anti_aliasing,
                tuple(cfg.pulse_widths), cfg.prop_loss_scaler,
            )
        total = sum(losses.values()) + sum(lidar_losses.values()) + prop_loss
        aux = dict(losses)
        aux.update(lidar_losses)
        aux["prop_loss"] = prop_loss
        aux["psnr"] = _psnr(out_p["rgb"], pixel_batch["pixels"])
        aux["total_pixel_loss"] = sum(losses.values())
        aux["total_lidar_loss"] = sum(lidar_losses.values())
        aux["range_rmse"] = jnp.sqrt(
            jnp.mean((out_l["depth"][..., 0] - lidar_batch["ranges"]) ** 2)
        )
        return total, aux

    # ---------------- full step ---------------- #
    def train_step(
        state: TrainState,
        pixel_batch: Dict[str, jnp.ndarray],
        lidar_batch: Optional[Dict[str, jnp.ndarray]],
        key,
        pixel_rg: bool,
        lidar_rg: bool,
        lidar_full: bool = False,
    ):
        step = state.step
        metrics: Dict[str, jnp.ndarray] = {}
        params, prop_params = state.params, state.prop_params
        opt_state, prop_opt_state = state.opt_state, state.prop_opt_state

        if mesh is not None:
            # decorrelate per-chip in-step randomness (gumbel aggregation
            # noise); batches are already distinct per shard
            key = jax.random.fold_in(
                key, jax.lax.axis_index(spmd.axis_name)
            )
        k_pix, k_pix_agg, k_lid, k_lid_agg = jax.random.split(key, 4)
        sched_count = step * steps_per_iter

        if cfg.fused_branches and cfg.has_lidar:
            # ONE combined render/backward/update (see TrainStepConfig)
            rg = pixel_rg or lidar_rg
            (_, aux), grads = jax.value_and_grad(
                joint_loss_fn, has_aux=True
            )((params, prop_params), pixel_batch, lidar_batch, k_pix,
              k_pix_agg, step, rg)
            g_model, g_prop = _reduce(grads)
            lr = lr_fn(sched_count)
            if rg:
                prop_params, prop_opt_state = _apply(
                    g_prop, prop_opt_state, prop_params, lr
                )
            params, opt_state = _apply(g_model, opt_state, params, lr)
            metrics.update(aux)
            metrics["lr"] = lr
            return TrainState(
                step=step + 1,
                params=params,
                prop_params=prop_params,
                opt_state=opt_state,
                prop_opt_state=prop_opt_state,
            ), _finalize_metrics(metrics)

        # pixel branch
        (_, aux), grads = jax.value_and_grad(
            pixel_loss_fn, has_aux=True
        )((params, prop_params), pixel_batch, k_pix, k_pix_agg, step, pixel_rg)
        g_model, g_prop = _reduce(grads)
        lr = lr_fn(sched_count)
        if pixel_rg:
            prop_params, prop_opt_state = _apply(
                g_prop, prop_opt_state, prop_params, lr
            )
        params, opt_state = _apply(g_model, opt_state, params, lr)
        metrics.update(aux)
        metrics["lr"] = lr

        # lidar branch (second forward/backward on the updated params)
        if cfg.has_lidar:
            (_, laux), lgrads = jax.value_and_grad(
                lidar_loss_fn, has_aux=True
            )((params, prop_params), lidar_batch, k_lid, k_lid_agg, step,
              lidar_rg, lidar_full)
            lg_model, lg_prop = _reduce(lgrads)
            lr2 = lr_fn(sched_count + 1)
            if lidar_rg:
                prop_params, prop_opt_state = _apply(
                    lg_prop, prop_opt_state, prop_params, lr2
                )
            params, opt_state = _apply(
                lg_model, opt_state, params, lr2
            )
            metrics.update(laux)

        new_state = TrainState(
            step=step + 1,
            params=params,
            prop_params=prop_params,
            opt_state=opt_state,
            prop_opt_state=prop_opt_state,
        )
        return new_state, _finalize_metrics(metrics)

    if mesh is None:
        return jax.jit(
            train_step,
            static_argnames=("pixel_rg", "lidar_rg", "lidar_full"),
            donate_argnames=("state",),
        )

    # explicit-collective SPMD: the whole step under shard_map; specs are
    # computed from the (trace-time) state structure — everything
    # replicated except the ZeRO-sharded big Adam moments
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from emernerf_tpu.parallel.spmd import state_partition_specs

    def sharded_step(state, pixel_batch, lidar_batch, key,
                     pixel_rg: bool, lidar_rg: bool, lidar_full: bool = False):
        specs = state_partition_specs(state, spmd, n_shards)
        bspec = jax.tree.map(lambda _: P(spmd.axis_name), pixel_batch)
        lspec = jax.tree.map(lambda _: P(spmd.axis_name), lidar_batch)
        fn = shard_map(
            partial(train_step, pixel_rg=pixel_rg, lidar_rg=lidar_rg,
                    lidar_full=lidar_full),
            mesh=mesh,
            in_specs=(specs, bspec, lspec, P()),
            out_specs=(specs, P()),
            check_vma=False,
        )
        return fn(state, pixel_batch, lidar_batch, key)

    return jax.jit(
        sharded_step,
        static_argnames=("pixel_rg", "lidar_rg", "lidar_full"),
        donate_argnames=("state",),
    )


def lidar_full_at(cfg: TrainStepConfig, it: int) -> bool:
    """Host-side staged lidar-K schedule: True once ``it`` passes
    ``lidar_topk_until`` of the run (and staging is active)."""
    return (
        cfg.has_lidar
        and cfg.lidar_topk_until < 1.0
        and (cfg.lidar_sample_topk > 0 or cfg.sample_topk > 0)
        and it >= cfg.lidar_topk_until * cfg.num_iters
    )


def init_train_state(model, prop_models, cfg: TrainStepConfig, key,
                     example_pixel_batch, example_lidar_batch=None):
    """Initialize parameters and optimizer states for training."""
    del example_lidar_batch
    tx = make_adam(cfg.weight_decay)
    r = example_pixel_batch["origins"].shape[0]
    s = cfg.num_samples
    pos = jnp.zeros((r, s, 3))
    dirs = jnp.ones((r, s, 3))
    data = {}
    if "normed_timestamps" in example_pixel_batch:
        data["normed_timestamps"] = jnp.zeros((r, s))
    if "img_idx" in example_pixel_batch:
        data["img_idx"] = jnp.zeros((r, s), jnp.int32)
    if "cam_idx" in example_pixel_batch:
        data["cam_idx"] = jnp.zeros((r, s), jnp.int32)
    if "pixel_coords" in example_pixel_batch:
        data["pixel_coords"] = jnp.zeros((r, 2))

    k_model, *k_props = jax.random.split(key, 1 + len(prop_models))
    params = model.init(
        {"params": k_model, "aggregation": k_model}, pos, dirs, data,
        train=False,
    )["params"]
    prop_params = tuple(
        pm.init(k, pos)["params"] for pm, k in zip(prop_models, k_props)
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        prop_params=prop_params,
        opt_state=tx.init(params),
        prop_opt_state=tx.init(prop_params),
    )
