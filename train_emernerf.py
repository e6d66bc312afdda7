#!/usr/bin/env python
"""EmerNeRF-TPU training CLI.

Drop-in counterpart of the reference entry point
(/root/reference/train_emernerf.py): same flag surface
(``--config_file ... opts a.b=c`` dotlist overrides), same log-dir layout
(``<output_root>/<project>/<run_name>``), config snapshotting, seeding —
but driving the TPU-native JAX pipeline.
"""

import argparse
import logging
import os
import random
import time

import numpy as np

# Honor JAX_PLATFORMS even when a site-level PJRT plugin registers a
# different default backend after jax reads the env (e.g. forcing
# JAX_PLATFORMS=cpu for CPU-only dry runs on a TPU-attached host).
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

from emernerf_tpu.config import load_config
from emernerf_tpu.utils.logging import setup_logging

DEFAULT_CONFIG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "configs", "default_config.yaml"
)


def get_args_parser():
    parser = argparse.ArgumentParser("Train EmerNeRF-TPU for a single scene")
    parser.add_argument("--config_file", help="path to config file", type=str,
                        default=None)
    parser.add_argument("--eval_only", action="store_true",
                        help="perform evaluation only")
    parser.add_argument(
        "--auto_resume", action="store_true",
        help="resume from the newest checkpoint in the run directory if "
        "one exists (pairs with optim.checkpoint_on_preempt: a preempted "
        "job restarted with the SAME command continues where it stopped; "
        "unlike resume_from, periodic checkpointing stays enabled)",
    )
    parser.add_argument("--visualize_voxel", action="store_true",
                        help="visualize voxel field after training")
    parser.add_argument(
        "--render_data_video", action="store_true",
        help="render a data inspection video before training",
    )
    parser.add_argument(
        "--render_data_video_only", action="store_true",
        help="render the data video and exit",
    )
    parser.add_argument(
        "--render_video_postfix", type=str, default=None,
        help="an optional postfix for rendered video names",
    )
    parser.add_argument("--output_root", default="./work_dirs/", type=str,
                        help="output root directory")
    parser.add_argument("--project", default="emernerf_tpu", type=str,
                        help="project name (sub-directory of output root)")
    parser.add_argument("--run_name", default="debug", type=str,
                        help="run name (sub-directory of project)")
    parser.add_argument(
        "--enable_wandb", action="store_true",
        help="enable wandb logging (no-op if wandb is unavailable)",
    )
    parser.add_argument(
        "--entity", default=None, type=str, required=False,
        help="wandb entity name (reference train_emernerf.py:93-99)",
    )
    parser.add_argument(
        "opts", nargs=argparse.REMAINDER,
        help="dotlist config overrides, e.g. data.scene_idx=700",
    )
    return parser


def setup(args):
    """Merge configs, create the run directory tree, snapshot the config
    (reference train_emernerf.py:123-182)."""
    cfg = load_config(DEFAULT_CONFIG, args.config_file, args.opts)

    log_dir = os.path.join(args.output_root, args.project, args.run_name)
    cfg.log_dir = log_dir
    # carried into wandb.init (project/run naming mirrors the reference,
    # train_emernerf.py:158-171)
    cfg.project = args.project
    cfg.run_name = args.run_name
    if getattr(args, "entity", None):
        cfg.wandb_entity = args.entity
    os.makedirs(log_dir, exist_ok=True)
    for sub in ("images", "full_videos", "test_videos", "lowres_videos",
                "metrics", "configs_bk", "buffer_maps"):
        os.makedirs(os.path.join(log_dir, sub), exist_ok=True)

    setup_logging(output=log_dir)
    logger = logging.getLogger("emernerf_tpu")
    logger.info("Config:\n%s", cfg.to_yaml())

    cfg.save(os.path.join(log_dir, "config.yaml"))
    cfg.save(
        os.path.join(log_dir, "configs_bk", f"config_{int(time.time())}.yaml")
    )

    random.seed(cfg.optim.seed)
    np.random.seed(cfg.optim.seed)
    return cfg


def main(args):
    from emernerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = setup(args)
    logger = logging.getLogger("emernerf_tpu")

    if args.render_data_video_only:
        # data-inspection video without building the model
        from emernerf_tpu.builders import build_dataset_from_cfg
        from emernerf_tpu.eval.data_preview import render_data_video

        dataset = build_dataset_from_cfg(cfg)
        render_data_video(
            dataset, os.path.join(cfg.log_dir, "data.mp4"),
            fps=cfg.render.fps,
        )
        logger.info("Render data video only, exiting...")
        return

    from emernerf_tpu.train.trainer import Trainer  # deferred: heavy imports

    if getattr(args, "auto_resume", False) and not cfg.resume_from:
        from emernerf_tpu.train.checkpoints import latest_checkpoint

        ckpt = latest_checkpoint(cfg.log_dir)
        if ckpt is not None:
            cfg.resume_from = ckpt
            # unlike a hand-set resume_from (reference quirk: resumed runs
            # never save, train_emernerf.py:864), an auto-resumed run keeps
            # periodic checkpointing on — preempt/restart cycles must not
            # silently stop persisting progress
            cfg.auto_resumed = True
            logger.info("auto_resume: resuming from %s", ckpt)
        else:
            logger.info("auto_resume: no checkpoint yet under %s",
                        cfg.log_dir)

    if (args.eval_only or args.visualize_voxel) and not cfg.resume_from:
        # --eval_only without resume_from would silently evaluate a random
        # init; pick up the newest checkpoint in the run directory instead
        from emernerf_tpu.train.checkpoints import latest_checkpoint

        ckpt = latest_checkpoint(cfg.log_dir)
        if ckpt is None:
            raise FileNotFoundError(
                f"--eval_only needs a checkpoint: none found under "
                f"{cfg.log_dir} and resume_from is unset"
            )
        logger.info("eval_only: resuming from latest checkpoint %s", ckpt)
        cfg.resume_from = ckpt

    trainer = Trainer(cfg, cfg.log_dir, enable_wandb=args.enable_wandb)

    if args.render_data_video:
        from emernerf_tpu.eval.data_preview import render_data_video

        render_data_video(
            trainer.dataset, os.path.join(cfg.log_dir, "data.mp4"),
            fps=cfg.render.fps,
        )

    if args.visualize_voxel or args.eval_only:
        if args.visualize_voxel:
            from emernerf_tpu.eval.points import PointQueryEngine
            from emernerf_tpu.eval.voxel_vis import (
                visualize_scene_flow,
                visualize_voxels,
            )

            engine = PointQueryEngine(trainer.model)
            times = (
                list(trainer.dataset.unique_normalized_training_timestamps)
                if trainer.model.has_dynamic
                else None
            )
            visualize_voxels(
                engine, trainer.state.params, trainer.dataset.aabb,
                os.path.join(cfg.log_dir, "voxels"),
                timesteps=times,
                voxel_size=cfg.render.vis_voxel_size,
                save_html=cfg.render.save_html or True,
            )
            if trainer.model.has_flow:
                visualize_scene_flow(
                    engine, trainer.state.params, trainer.dataset,
                    os.path.join(cfg.log_dir, "scene_flow"),
                )

    if args.eval_only:
        trainer.evaluate()
        # keep the committed run summary in sync with a post-hoc eval just
        # like the end-of-training path below (round-4 weak #4)
        try:
            from perf.northstar_report import write_report

            logger.info("Run report: %s", write_report(cfg.log_dir))
        except Exception as e:
            logger.warning("run report generation failed: %s", e)
        return

    t0 = time.time()
    trainer.train()
    if trainer.preempted:
        # exit inside the preemption grace window: the checkpoint is saved,
        # a later --eval_only / resume_from picks up from it
        logger.info("Preempted: skipping end-of-training evaluation")
        return
    elapsed = time.time() - t0
    iters = cfg.optim.num_iters - trainer.start_step
    rays_per_iter = cfg.data.ray_batch_size * (
        2 if trainer.step_cfg.has_lidar else 1
    )
    logger.info(
        "Training done: %d iters in %.1fs (%.0f rays/s)",
        iters, elapsed, iters * rays_per_iter / max(elapsed, 1e-9),
    )
    trainer.evaluate()

    # regenerate the run report at exit so the committed summary can never
    # go stale relative to its run (round-4 weak #4)
    try:
        from perf.northstar_report import write_report

        logger.info("Run report: %s", write_report(cfg.log_dir))
    except Exception as e:  # reporting must never kill a finished run
        logger.warning("run report generation failed: %s", e)

    # reclaim disk from extracted feature maps when asked
    # (reference train_emernerf.py:1019-1020)
    if cfg.data.pixel_source.get("delete_features_after_run", False):
        from emernerf_tpu.tools.extract_features import delete_features

        feat_dir = os.path.join(
            getattr(trainer.dataset, "data_path", ""),
            cfg.data.pixel_source.feature_model_type,
        )
        if os.path.isdir(feat_dir):
            delete_features(feat_dir)
            logger.info("Deleted extracted features under %s", feat_dir)


if __name__ == "__main__":
    main(get_args_parser().parse_args())
