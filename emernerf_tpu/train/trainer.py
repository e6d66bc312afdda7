"""Training orchestration: the outer loop around the fused train step.

Counterpart of the reference ``main()`` loop
(/root/reference/train_emernerf.py:434-1023): builds dataset/models/state,
iterates the jitted step with host-side proposal-requires-grad scheduling,
and handles periodic checkpointing, pixel-error-buffer refresh
(cache_rgb_freq), and end-of-training evaluation with metric JSON + videos.
"""

from __future__ import annotations

import json
import logging
import os
import signal
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emernerf_tpu.builders import (
    build_dataset_from_cfg,
    build_model_from_cfg,
    build_propnets_from_cfg,
    build_train_step_config,
)
from emernerf_tpu.config import ConfigNode
from emernerf_tpu.data.scene import (
    sample_lidar_batch,
    sample_pixel_batch,
    update_pixel_error_map,
)
from emernerf_tpu.eval.metrics import compute_valid_depth_rmse
from emernerf_tpu.eval.renderer import ImageRenderer
from emernerf_tpu.eval.video import save_videos
from emernerf_tpu.render.prop_sampler import proposal_requires_grad_schedule
from emernerf_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from emernerf_tpu.train.step import build_train_step, init_train_state, lidar_full_at
from emernerf_tpu.utils.logging import MetricLogger

logger = logging.getLogger("emernerf_tpu")


def raise_on_nonfinite(scalars: Dict[str, float], step: int) -> None:
    """NaN tripwire (reference raises inside every loss when
    optim.check_nan, /root/reference/loss/base.py:77-79).  The TPU
    equivalent inspects already-fetched metric scalars: a NaN poisons the
    params, so it is still visible at the next print step instead of
    silently burning the rest of a 25k-iteration run."""
    bad = [
        k for k, v in scalars.items()
        if ("loss" in k or k == "psnr") and not np.isfinite(v)
    ]
    if bad:
        raise RuntimeError(
            f"Non-finite loss detected at step {int(step)}: {bad} "
            f"(optim.check_nan=True)"
        )


def init_wandb(cfg: ConfigNode, log_dir: str, retries: int = 10,
               sleep_s: float = 1.0):
    """wandb.init with a retry loop for flaky cloud machines (reference
    train_emernerf.py:146-157); returns the module or None (graceful
    degradation — a logging outage must not kill a 25k-iter run)."""
    for attempt in range(retries):
        try:
            import wandb

            wandb.init(
                project=cfg.get("project", "emernerf_tpu"),
                entity=cfg.get("wandb_entity", None),
                name=cfg.get("run_name", None),
                dir=log_dir, config=cfg.to_dict(),
            )
            return wandb
        except ImportError as e:  # wandb not installed: no retry
            logger.warning("wandb disabled: %s", e)
            return None
        except Exception as e:
            logger.warning(
                "wandb init failed (attempt %d/%d): %s",
                attempt + 1, retries, e,
            )
            time.sleep(sleep_s)
    logger.warning("wandb disabled after %d failed init attempts", retries)
    return None


class Trainer:
    def __init__(self, cfg: ConfigNode, log_dir: str, enable_wandb: bool = False):
        self.cfg = cfg
        self.log_dir = log_dir

        # ray-batch data parallelism over an ICI mesh (SURVEY §2.4: the
        # reference's NCCL helpers are dormant; this is the TPU-native
        # axis).  Validate + build the mesh before any expensive dataset
        # or model construction so bad configs fail fast.
        self.mesh = None
        n_dev = int(cfg.get_dotted("parallel.num_devices", 1))
        if n_dev == 0:
            n_dev = jax.device_count()
        if n_dev > 1:
            from emernerf_tpu.parallel.mesh import make_mesh

            if cfg.data.ray_batch_size % n_dev:
                raise ValueError(
                    f"data.ray_batch_size {cfg.data.ray_batch_size} must "
                    f"divide by parallel.num_devices {n_dev}"
                )
            self.mesh = make_mesh(n_dev)
            logger.info("Data-parallel mesh over %d devices", n_dev)

        self.wandb = init_wandb(cfg, log_dir) if enable_wandb else None

        logger.info("Building dataset...")
        self.dataset = build_dataset_from_cfg(cfg)
        logger.info(
            "Dataset: %d images (%d train / %d test), aabb=%s",
            self.dataset.num_images, len(self.dataset.train_indices),
            len(self.dataset.test_indices), self.dataset.aabb,
        )
        self.scene = self.dataset.scene_tensors()

        self.model = build_model_from_cfg(cfg, self.dataset)
        self.prop_models = build_propnets_from_cfg(cfg, self.dataset)
        self.step_cfg = build_train_step_config(cfg, self.dataset)
        logger.info("Train step config: %s", self.step_cfg)

        self.ray_batch_size = cfg.data.ray_batch_size
        self.buffer_ratio = cfg.data.pixel_source.sampler.buffer_ratio
        self.buffer_downscale = cfg.data.pixel_source.sampler.buffer_downscale

        key = jax.random.PRNGKey(cfg.optim.seed)
        self.key = key
        example_batch = sample_pixel_batch(
            self.scene, key, self.ray_batch_size,
            use_timestamps=self.model.has_dynamic,
        )
        self.state = init_train_state(
            self.model, self.prop_models, self.step_cfg, key, example_batch
        )
        n_params = sum(x.size for x in jax.tree.leaves(self.state.params))
        logger.info("Model parameters: %.2fM", n_params / 1e6)

        # multi-chip: explicit-collective shard_map step (bf16 grad psum,
        # optional ZeRO) by default; parallel.explicit_collectives=false
        # falls back to the implicit-SPMD wrapper (fp32 all-reduce placed
        # by XLA) — see perf/MULTICHIP_MODEL.md for the measured cost gap
        explicit = bool(
            cfg.get_dotted("parallel.explicit_collectives", True)
        )
        if self.mesh is not None and explicit:
            from emernerf_tpu.parallel.spmd import SpmdConfig, shard_state

            spmd = SpmdConfig(
                grad_psum_dtype=str(
                    cfg.get_dotted("parallel.grad_psum_dtype", "bfloat16")
                ),
                zero=bool(cfg.get_dotted("parallel.zero", True)),
                direction_dtype=str(
                    cfg.get_dotted("parallel.direction_dtype", "bfloat16")
                ),
            )
            self.state = shard_state(self.state, self.mesh, spmd)
            self.train_step = build_train_step(
                self.model, self.prop_models, self.step_cfg,
                mesh=self.mesh, spmd=spmd,
            )
        else:
            self.train_step = build_train_step(
                self.model, self.prop_models, self.step_cfg
            )
            if self.mesh is not None:
                from emernerf_tpu.parallel.mesh import shard_train_step

                self.train_step = shard_train_step(
                    self.train_step, self.mesh
                )
        self._sample_pixel = jax.jit(
            partial(
                sample_pixel_batch,
                num_rays=self.ray_batch_size,
                buffer_ratio=self.buffer_ratio,
                buffer_downscale=self.buffer_downscale,
                use_timestamps=self.model.has_dynamic,
            )
        )
        self._sample_pixel_uniform = jax.jit(
            partial(
                sample_pixel_batch,
                num_rays=self.ray_batch_size,
                buffer_ratio=0.0,
                use_timestamps=self.model.has_dynamic,
            )
        )
        if self.step_cfg.has_lidar:
            self._sample_lidar = jax.jit(
                partial(sample_lidar_batch, num_rays=self.ray_batch_size)
            )

        self.renderer = ImageRenderer(
            self.model, self.prop_models,
            num_samples=cfg.nerf.sampling.num_samples,
            prop_samples=tuple(cfg.nerf.propnet.num_samples_per_prop),
            near_plane=cfg.nerf.propnet.near_plane,
            far_plane=cfg.nerf.propnet.far_plane,
            sampling_type=cfg.nerf.propnet.sampling_type,
            chunk_size=cfg.render.render_chunk_size,
            return_decomposition=self.model.has_dynamic,
            mesh=self.mesh,
            sample_topk=int(cfg.get_dotted("render.eval_sample_topk", 0)),
        )

        self.start_step = 0
        self.preempted = False
        if cfg.resume_from:
            self.state = load_checkpoint(cfg.resume_from, self.state)
            self.start_step = int(self.state.step)
            logger.info("Resumed from %s at step %d", cfg.resume_from,
                        self.start_step)

    # ---------------------------------------------------------------- #
    def train(self):
        cfg = self.cfg
        num_iters = cfg.optim.num_iters
        metrics_file = os.path.join(self.log_dir, "metrics.json")
        metric_logger = MetricLogger(delimiter="  ", output_file=metrics_file)
        rg_fn = proposal_requires_grad_schedule()
        error_map_buffered = False

        check_nan = bool(cfg.optim.get("check_nan", False))
        prof_start = int(cfg.logging.get("profiling_start_iter", -1))
        prof_iters = int(cfg.logging.get("profiling_num_iters", 5))

        # Graceful preemption (no reference analogue; TPU pods are routinely
        # preempted): first SIGTERM/SIGINT requests a clean stop — the loop
        # finishes the current step, saves a checkpoint at that step, and
        # returns normally so a later resume_from/--eval_only loses nothing.
        # Handlers are restored on first receipt, so a second signal kills
        # the process the default way.
        stop_signal: list = []
        prev_handlers: dict = {}

        def _request_stop(signum, frame):
            stop_signal.append(signum)
            for sig, h in prev_handlers.items():
                try:
                    signal.signal(sig, h)
                except (ValueError, OSError):  # pragma: no cover
                    pass

        if bool(cfg.optim.get("checkpoint_on_preempt", True)):
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    prev_handlers[sig] = signal.signal(sig, _request_stop)
                except ValueError:
                    # signal.signal only works in the main thread; trainers
                    # driven from worker threads simply lose this feature
                    prev_handlers.clear()
                    break

        try:
            all_iters = np.arange(self.start_step, num_iters + 1)
            for step in metric_logger.log_every(all_iters, cfg.logging.print_freq):
                if stop_signal:
                    path = save_checkpoint(self.log_dir, self.state)
                    logger.info(
                        "Preempted (signal %d) at step %d: saved %s; exiting "
                        "cleanly", stop_signal[0], int(self.state.step), path,
                    )
                    # callers (train_emernerf.main) skip end-of-training eval:
                    # a preemption grace window cannot afford a full render pass
                    self.preempted = True
                    return self.state
                if prof_start >= 0 and step == prof_start:
                    prof_dir = os.path.join(self.log_dir, "profile")
                    os.makedirs(prof_dir, exist_ok=True)
                    jax.profiler.start_trace(prof_dir)
                    logger.info("Started jax.profiler trace -> %s", prof_dir)
                self.key, k_p, k_l, k_s = jax.random.split(self.key, 4)
                pixel_rg = rg_fn(int(step))
                if error_map_buffered and self.buffer_ratio > 0:
                    pixel_batch = self._sample_pixel(self.scene, k_p)
                else:
                    pixel_batch = self._sample_pixel_uniform(self.scene, k_p)
                if self.step_cfg.has_lidar:
                    lidar_rg = rg_fn(int(step))
                    lidar_batch = self._sample_lidar(self.scene, k_l)
                else:
                    lidar_rg = False
                    lidar_batch = None

                self.state, m = self.train_step(
                    self.state, pixel_batch, lidar_batch, k_s,
                    pixel_rg=pixel_rg, lidar_rg=lidar_rg,
                    lidar_full=lidar_full_at(self.step_cfg, int(step)),
                )

                if prof_start >= 0 and step == prof_start + prof_iters:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    logger.info("Stopped jax.profiler trace at step %d", int(step))

                if step % cfg.logging.print_freq == 0 or step == num_iters:
                    scalars = {k: float(v) for k, v in m.items() if np.ndim(v) == 0}
                    metric_logger.update(**scalars)
                    if self.wandb is not None:
                        self.wandb.log(scalars, step=int(step))
                    if check_nan:
                        raise_on_nonfinite(scalars, int(step))

                if (
                    step > 0
                    and cfg.logging.saveckpt_freq > 0
                    and step % cfg.logging.saveckpt_freq == 0
                    # reference quirk kept: hand-resumed runs never save
                    # (train_emernerf.py:864) — but --auto_resume re-enables
                    # saving, else preempt/restart cycles would stop persisting
                    and (not cfg.resume_from or bool(cfg.get("auto_resumed",
                                                             False)))
                ):
                    path = save_checkpoint(self.log_dir, self.state)
                    logger.info("Saved checkpoint: %s", path)

                # pixel-error-buffer refresh from low-res renders
                # (train_emernerf.py:879-930)
                if (
                    self.buffer_ratio > 0
                    and step > 0
                    and step % cfg.optim.cache_rgb_freq == 0
                ):
                    self._refresh_error_map()
                    error_map_buffered = True

            path = save_checkpoint(self.log_dir, self.state)
            logger.info("Saved final checkpoint: %s", path)
            return self.state
        finally:
            # restore handlers on EVERY exit path — a raised NaN tripwire
            # must not leak _request_stop into the process signal table
            for sig, h in prev_handlers.items():
                try:
                    signal.signal(sig, h)
                except (ValueError, OSError):  # pragma: no cover
                    pass

    # ---------------------------------------------------------------- #
    def _refresh_error_map(self):
        logger.info("Refreshing pixel error buffer...")
        ds = self.buffer_downscale
        preds, gts, dyn_ops = [], [], []
        for idx in self.dataset.full_indices:
            rays, gt = self.dataset.get_image_rays(int(idx), downscale=ds)
            maps = self.renderer.render_image(
                self.state.params, self.state.prop_params, rays, gt["hw"]
            )
            preds.append(maps["rgb"])
            gts.append(gt["pixels"])
            if "dynamic_opacity" in maps:
                dyn_ops.append(maps["dynamic_opacity"])
        pred = jnp.asarray(np.stack(preds))
        gtv = jnp.asarray(np.stack(gts))
        dyn = jnp.asarray(np.stack(dyn_ops)) if dyn_ops else None
        self.scene = update_pixel_error_map(self.scene, pred, gtv, dyn)
        # dump the importance maps for inspection (train_emernerf.py:879-930)
        buffer_dir = os.path.join(self.log_dir, "buffer_maps")
        os.makedirs(buffer_dir, exist_ok=True)
        maps = np.asarray(self.scene.pixel_error_map)
        np.save(
            os.path.join(buffer_dir, f"buffer_{int(self.state.step):05d}.npy"),
            maps.astype(np.float16),
        )

    # ---------------------------------------------------------------- #
    def evaluate(self, step: Optional[int] = None) -> Dict[str, float]:
        """End-of-training evaluation (train_emernerf.py:185-431): renders
        the configured splits, writes metric JSONs and videos."""
        cfg = self.cfg
        step = int(self.state.step) if step is None else step
        results: Dict[str, float] = {}
        video_dir = os.path.join(self.log_dir, "videos")
        os.makedirs(video_dir, exist_ok=True)

        # few-shot Occ3D semantic-occupancy eval (train_emernerf.py:201-232)
        if cfg.eval.eval_occ:
            from emernerf_tpu.eval.occ import run_occ_eval
            from emernerf_tpu.eval.points import PointQueryEngine

            if not hasattr(self.dataset, "ego_to_worlds"):
                logger.warning(
                    "eval_occ=True but the dataset has no ego poses / Occ3D "
                    "annotations (only the Waymo loader provides them); "
                    "skipping occupancy eval"
                )
            else:
                try:
                    occ_metrics = run_occ_eval(
                        self.dataset, PointQueryEngine(self.model),
                        self.state.params,
                        annotation_stride=cfg.eval.occ_annotation_stride,
                    )
                except FileNotFoundError as e:
                    logger.warning(
                        "eval_occ=True but Occ3D annotations missing: %s", e
                    )
                    occ_metrics = None
                if occ_metrics is not None:
                    for k, v in occ_metrics.items():
                        if np.ndim(v) == 0:
                            results[f"occ/{k}"] = float(v)
                    with open(
                        os.path.join(
                            self.log_dir, f"metrics_occ_{step}.json"
                        ),
                        "w",
                    ) as f:
                        json.dump(occ_metrics, f, indent=2)
                    logger.info("[occ] %s", occ_metrics)

        # lidar scene-flow eval (train_emernerf.py:234-288)
        if (
            cfg.eval.eval_lidar_flow
            and self.model.has_flow
            and self.dataset.lidar is not None
            and "flows" in self.dataset.lidar
        ):
            from emernerf_tpu.eval.flow import evaluate_lidar_flow
            from emernerf_tpu.eval.points import PointQueryEngine

            engine = PointQueryEngine(self.model)
            flow_metrics = evaluate_lidar_flow(
                engine, self.state.params, self.dataset,
                remove_ground=cfg.eval.remove_ground_when_eval_lidar_flow,
            )
            for k, v in flow_metrics.items():
                results[f"flow/{k}"] = v
            with open(
                os.path.join(self.log_dir, f"metrics_flow_{step}.json"), "w"
            ) as f:
                json.dump(flow_metrics, f, indent=2)
            logger.info("[flow] %s", flow_metrics)

        vis_keys = ["gt_rgb", "rgb", "depth"]
        if self.model.has_dynamic:
            vis_keys += ["static_rgb", "dynamic_rgb", "dynamic_depth"]
        if self.model.has_flow:
            vis_keys += ["forward_flow", "backward_flow"]
        if self.model.enable_feature_head:
            vis_keys += ["dino_feat"]

        def _run(split_name, indices, downscale):
            if len(indices) == 0:
                return
            frames, metrics = self.renderer.render_split(
                self.state.params, self.state.prop_params, self.dataset,
                indices, downscale=downscale,
            )
            for k, v in metrics.items():
                results[f"{split_name}/{k}"] = v
            n_t = len(indices) // self.dataset.num_cams
            save_videos(
                frames,
                os.path.join(video_dir, f"{split_name}_{step}.mp4"),
                keys=vis_keys,
                num_timestamps=max(n_t, 1),
                fps=cfg.render.fps,
                num_cams=self.dataset.num_cams,
                save_seperate_video=False,
            )
            with open(
                os.path.join(self.log_dir, f"metrics_{split_name}_{step}.json"),
                "w",
            ) as f:
                json.dump(metrics, f, indent=2)
            logger.info("[%s] %s", split_name, metrics)
            # wandb image panels for a few rendered frames
            # (reference train_emernerf.py:960-1004)
            if self.wandb is not None and frames:
                panel = {}
                stride = max(len(frames) // 3, 1)
                for i, fr in enumerate(frames[::stride][:3]):
                    for k in ("rgb", "gt_rgb", "depth", "dynamic_rgb"):
                        if k in fr:
                            img = np.asarray(fr[k], np.float32)
                            if img.ndim == 2:
                                img = img / max(float(img.max()), 1e-6)
                            panel[f"{split_name}/{k}_{i}"] = self.wandb.Image(
                                np.clip(img, 0, 1)
                            )
                self.wandb.log(panel, step=step)

        if cfg.render.render_low_res:
            _run("lowres", self.dataset.full_indices,
                 cfg.render.low_res_downscale)
        if cfg.render.render_test and self.dataset.has_test_split:
            _run("test", self.dataset.test_indices, 1)
        if cfg.render.render_full:
            _run("full", self.dataset.full_indices, 1)

        # novel-trajectory rendering (a reference TODO, implemented here:
        # SE(3)-upsampled front-cam path with a lateral sweep)
        if cfg.render.render_novel_trajectory:
            from emernerf_tpu.eval.novel import render_novel_trajectory

            frames = render_novel_trajectory(
                self.renderer, self.state.params, self.state.prop_params,
                self.dataset, downscale=cfg.render.low_res_downscale,
            )
            save_videos(
                frames,
                os.path.join(video_dir, f"novel_{step}.mp4"),
                keys=[k for k in ("rgb", "depth") if k in frames[0]],
                num_timestamps=len(frames),
                fps=cfg.render.fps * 2,
                num_cams=1,
                save_seperate_video=False,
            )
            logger.info("Rendered novel trajectory (%d frames)", len(frames))

        # lidar depth eval on a few frames
        if self.dataset.lidar is not None:
            rmses = []
            frames_to_eval = range(
                0, self.dataset.num_frames,
                max(self.dataset.num_frames // 4, 1),
            )
            for f_idx in frames_to_eval:
                rays = self.dataset.get_lidar_render_rays(f_idx)
                if rays is None or len(rays["origins"]) == 0:
                    continue
                gt_ranges = rays.pop("ranges")
                out = self.renderer.render_rays_chunked(
                    self.state.params, self.state.prop_params, rays,
                    is_lidar=True,
                )
                rmses.append(
                    compute_valid_depth_rmse(out["depth"][..., 0], gt_ranges)
                )
            if rmses:
                results["lidar/depth_rmse"] = float(np.mean(rmses))

        with open(os.path.join(self.log_dir, f"metrics_all_{step}.json"), "w") as f:
            json.dump(results, f, indent=2)
        logger.info("Evaluation results: %s", results)
        return results
